"""Tests for corpus text analysis, dedup, and similarity operators."""

import math
import random

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.text import (
    char_shingles,
    fingerprint_md5,
    lang_guess,
    quality_score,
    token_count,
    word_shingles,
)
from crawler_spark.operators.dedup import (
    embedding_near_dups,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_near_dups,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dups,
)
from crawler_spark.operators.similarity import ann_topk_srp, cosine_topk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog and the cat"),
        (2, "The quick brown fox jumps over the lazy dog and the cat"),  # exact dup of 1
        (3, "The quick brown fox jumped over the lazy dog and the cat"),  # near dup of 1
        (4, "Der schnelle braune Fuchs springt und der Hund ist faul"),
        (5, "completely different text about spark dataframes and shuffles here"),
        (6, ""),  # empty
        (7, "  the   quick\tbrown fox Jumps over the lazy dog and the cat "),  # ws/case variant → exact dup of 1 after normalize
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("   ",), ("one",)], ["t"])
    got = [r[0] for r in df.select(token_count(F.col("t"))).collect()]
    assert got == [3, 0, 0, 1]


def test_shingles(spark):
    df = spark.createDataFrame([("abcd",), ("ab",), ("",)], ["t"])
    got = [r[0] for r in df.select(char_shingles(F.col("t"), 3)).collect()]
    assert got == [["abc", "bcd"], [], []]
    df2 = spark.createDataFrame([("a b c",), ("a",)], ["t"])
    got2 = [r[0] for r in df2.select(word_shingles(F.col("t"), 2)).collect()]
    assert got2 == [["a b", "b c"], []]


def test_lang_guess(docs):
    got = {r["doc_id"]: r["lg"] for r in docs.select("doc_id", lang_guess(F.col("text")).alias("lg")).collect()}
    assert got[1] == "en"
    assert got[4] == "de"
    assert got[6] == "und"


def test_quality_score_bounds(docs):
    got = [r[0] for r in docs.select(quality_score(F.col("text"))).collect()]
    assert all(0.0 <= q <= 1.0 for q in got)


def test_exact_dedup(docs):
    d = exact_dedup(docs, "doc_id", "text")
    rows = {r["keep_id"]: r["n_dups"] for r in d.collect()}
    # docs 1, 2, 7 normalize to the same text → representative 1, count 3
    assert rows[1] == 3
    assert rows[3] == 1
    assert rows[5] == 1


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("  hello world ",), ("hello worlds",)], ["t"]
    )
    fps = [r[0] for r in df.select(fingerprint_md5(F.col("t"))).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_minhash_lsh_finds_near_dup(docs):
    pairs = minhash_near_dups(docs, "doc_id", "text", threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert not any(5 in p for p in got)


def test_minhash_estimates_jaccard(spark):
    """MinHash estimate should be close to exact Jaccard on a controlled pair."""
    rng = random.Random(0)
    base = " ".join(f"w{rng.randrange(500)}" for _ in range(200))
    mutated = base[: len(base) // 2] + " xyz unique tail " + base[len(base) // 2 :]
    df = spark.createDataFrame([(1, base), (2, mutated)], "doc_id long, text string")
    exact = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0).collect()[0]["jaccard"]
    est_rows = minhash_near_dups(df, "doc_id", "text", k=64, bands=16, rows=4, threshold=0.0).collect()
    assert est_rows, "LSH should catch a high-jaccard pair"
    est = est_rows[0]["est_jaccard"]
    assert abs(est - exact) < 0.2, (est, exact)


def test_ngram_jaccard_exact_values(spark):
    df = spark.createDataFrame([(1, "abcde"), (2, "abcdx")], "doc_id long, text string")
    # 3-grams: {abc,bcd,cde} vs {abc,bcd,cdx} → inter 2, union 4 → 0.5
    r = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0).collect()[0]
    assert r["jaccard"] == pytest.approx(0.5)


def test_simhash_near_dups(docs):
    sh = simhash(docs.where("text <> ''"), "doc_id", "text")
    vals = {r["id"]: r["simhash"] for r in sh.collect()}
    # exact dups have identical simhash
    assert vals[1] == vals[2] == vals[7]
    pairs = simhash_near_dups(sh, radius=16)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) in got
    assert (1, 5) not in got


def _hamming64(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_simhash_near_dups_adversarial_exact(spark):
    """The skew-proof pigeonhole join must be EXACT on data built to
    trigger every path: an identical-hash clique (distinct-hash
    reduction + eq-pair expansion), a heavy level-1 bucket (two-level
    complement re-blocking), and uniform background (light path)."""
    rng = random.Random(7)
    radius = 6

    def r64():
        return rng.getrandbits(64) - (1 << 63)

    rows = []
    nid = 0

    def add(h):
        nonlocal nid
        rows.append((nid, h))
        nid += 1

    # identical-hash clique: 12 copies -> C(12,2)=66 hamming-0 pairs
    clique = r64()
    for _ in range(12):
        add(clique)
    # heavy bucket: 30 DISTINCT hashes agreeing on block 0 (low 9 bits
    # for radius 6); a few of them within radius of each other
    base = r64() & ~0x1FF | 0x155
    add(base)
    add(base ^ (0b11 << 20))            # hamming 2 from base
    add(base ^ (0b10101 << 40))         # hamming 3 from base
    seen_vals = {clique, base, base ^ (0b11 << 20), base ^ (0b10101 << 40)}
    while len(seen_vals) < 4 + 27:
        h = (r64() & ~0x1FF) | (base & 0x1FF)  # same block-0 value
        if h not in seen_vals:
            seen_vals.add(h)
            add(((h + 2**63) % 2**64) - 2**63)
    # uniform background
    for _ in range(50):
        add(r64())

    expected = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            d = _hamming64(rows[i][1], rows[j][1])
            if d <= radius:
                ia, ib = rows[i][0], rows[j][0]
                expected.add((min(ia, ib), max(ia, ib), d))
    assert len(expected) > 66, "planted near-dups must survive construction"

    sh = spark.createDataFrame(rows, "id long, simhash long")
    # the 30-distinct-hash block-0 bucket exceeds max_bucket=8, forcing
    # the two-level heavy path; a huge cap keeps everything light
    for cap in (8, 10**9):
        got = {(r["id_a"], r["id_b"], r["hamming"])
               for r in simhash_near_dups(sh, radius=radius, max_bucket=cap).collect()}
        assert got == expected, (cap, len(got), len(expected))


def test_simhash_deterministic(docs, spark):
    a = {r["id"]: r["simhash"] for r in simhash(docs, "doc_id", "text").collect()}
    b = {r["id"]: r["simhash"] for r in simhash(docs, "doc_id", "text").collect()}
    assert a == b


@pytest.fixture(scope="module")
def emb(spark):
    rng = random.Random(1)
    rows = []
    for i in range(60):
        v = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((i, [float(x) for x in v]))
    # 100: near-copy of 0; 101: exact copy of 0
    v0 = rows[0][1]
    rows.append((100, [x + 0.01 for x in v0]))
    rows.append((101, list(v0)))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))


def test_cosine_topk_matches_python(emb, spark):
    rows = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    q = rows[0]
    want = sorted(
        ((vid, _cos(v, q)) for vid, v in rows.items()), key=lambda t: (-t[1], t[0])
    )[:5]
    got = [(r["id"], r["score"]) for r in cosine_topk(emb, "vec_id", "embedding", q, 5).collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gid, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-5)


def test_ann_srp_finds_close_neighbors(emb):
    rows = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    q = rows[0]
    got = [r["id"] for r in ann_topk_srp(emb, "vec_id", "embedding", q, 5, bits=4).collect()]
    # identical + near-identical vectors share the query's bucket
    assert 0 in got and 101 in got and 100 in got


def test_embedding_near_dups(emb):
    pairs = embedding_near_dups(emb, "vec_id", "embedding", threshold=0.99)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 100) in got and (0, 101) in got and (100, 101) in got


def test_embedding_near_dups_identical_and_zero_vectors(spark):
    # 10 rows of one identical vector must yield C(10,2)=45 pairs at
    # cosine 1.0 from the equal-vector path (they collapse to one
    # hashed row); zero vectors normalize to NaN and must emit nothing
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(10)]
    rows += [(100 + i, [0.0, 0.0, 0.0, 0.0]) for i in range(3)]
    rows.append((200, [-5.0, 1.0, 0.5, 2.0]))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [(r["id_a"], r["id_b"], r["cosine"])
           for r in embedding_near_dups(e, "vec_id", "embedding", threshold=0.95).collect()]
    assert len(got) == 45
    assert all(a < 10 and b < 10 and abs(c - 1.0) < 1e-6 for a, b, c in got)


def test_ngram_jaccard_identical_clique_survives_freq_cap(spark):
    # 30 identical docs: every shingle has row-weighted df 30 > cap 10,
    # so the banded/cross path sees nothing — the clique's C(30,2)=435
    # pairs (jaccard 1.0 by definition) come from the equal-text path.
    # Pre-round-4, these pairs were silently LOST to the cap.
    df = spark.createDataFrame(
        [(i, "same boilerplate footer text") for i in range(30)]
        + [(100, "an unrelated different document")],
        "doc_id long, text string")
    got = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5,
                              max_shingle_freq=10).collect()
    assert len(got) == 435
    assert all(r["jaccard"] == 1.0 and r["id_a"] < r["id_b"] < 100 for r in got)


def test_lsh_identical_sigs_survive_bucket_cap(spark):
    # 20 identical docs share one signature; since round 4 they collapse
    # to ONE banded row (distinct-signature reduction) and their
    # C(20,2)=190 pairs come from the output-bound equal-signature
    # self-join — the cap can no longer drop an exact-dup clique
    df = spark.createDataFrame(
        [(i, "the exact same boilerplate page body") for i in range(20)],
        "doc_id long, text string")
    sig = minhash_signatures(df, "doc_id", "text")
    pairs = lsh_candidate_pairs(sig, max_bucket=10)
    assert pairs.count() == 190
    # the end-to-end operator finds the clique too, at est 1.0
    nd = minhash_near_dups(df, "doc_id", "text", max_bucket=10).collect()
    assert len(nd) == 190 and all(r["est_jaccard"] == 1.0 for r in nd)


def test_lsh_bucket_cap_drops_diverse_degenerate(spark):
    # 20 DIFFERENT signatures (last band varies) that collide in the
    # first 7 of 8 bands: every shared bucket holds 20 distinct
    # signatures > cap 10, so the cap drops them — the documented
    # coverage cap now only ever bites genuine hash degeneracy
    rows = [(i, [7] * 28 + [i] * 4) for i in range(20)]
    sig = spark.createDataFrame(rows, "id long, sig array<long>")
    assert lsh_candidate_pairs(sig, max_bucket=10).count() == 0
    assert lsh_candidate_pairs(sig, max_bucket=1000).count() == 190


def test_ivf_topk_matches_brute_force_on_clusters(spark):
    """IVF with enough probes recovers the brute-force top-k on
    well-clustered data; deterministic across runs."""
    import random as rnd

    from crawler_spark.operators.similarity import cosine_topk, ivf_topk, ivf_train

    r = rnd.Random(3)
    centers = [[r.gauss(0, 5) for _ in range(8)] for _ in range(4)]
    rows = []
    for i in range(200):
        c = centers[i % 4]
        rows.append((i, [float(x + r.gauss(0, 0.2)) for x in c]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = rows[0][1]

    cents = ivf_train(emb, "vec_id", "embedding", k=4, iters=2)
    assert cents == ivf_train(emb, "vec_id", "embedding", k=4, iters=2)  # deterministic

    want = [r_["id"] for r_ in cosine_topk(emb, "vec_id", "embedding", q, 10).collect()]
    got = [r_["id"] for r_ in ivf_topk(
        emb, "vec_id", "embedding", q, 10, centroids=cents, nprobe=2
    ).collect()]
    assert got == want  # query's cluster fully covered by 2 probes


def test_embedding_near_dup_recall_planted(spark):
    """VERDICT item: the SRP-blocked near-dup operator needs a measured
    recall-vs-exact number to be trusted as the production dedup path.
    Planted corpus: 100 random unit vectors + 30 jittered copies
    (cosine ≈ 0.97); recall of the multi-table LSH operator vs the
    numpy-exact pair set at threshold 0.95 must be ≥ 0.95."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(100, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(f"b{i:03d}", [float(x) for x in base[i]]) for i in range(100)]
    for i in range(30):
        v2 = base[i] + 0.03 * rng.normal(size=64)
        v2 /= np.linalg.norm(v2)
        rows.append((f"d{i:03d}", [float(x) for x in v2]))

    M = np.array([r[1] for r in rows])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    ids = [r[0] for r in rows]
    truth = {
        (ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if S[i, j] >= 0.95
    }
    assert len(truth) >= 25, "fixture must contain planted near-dups"

    emb = spark.createDataFrame(rows, "id string, embedding array<double>")
    found = {
        (r["id_a"], r["id_b"]) if r["id_a"] < r["id_b"] else (r["id_b"], r["id_a"])
        for r in embedding_near_dups(emb, "id", "embedding", threshold=0.95).collect()
    }
    assert found <= truth  # candidates are cosine-verified → exact precision
    recall = len(found & truth) / len(truth)
    assert recall >= 0.95, f"SRP multi-table recall {recall:.3f} < 0.95"


def test_ivf_persisted_index(spark, tmp_path):
    """VERDICT item: IVF must not re-train per query. Build the index
    once (vectors partitioned by centroid + tiny centroids table); a
    query must plan as a pruned scan of nprobe partitions and agree with
    brute force on most of the top-k."""
    from crawler_spark.operators.similarity import (
        cosine_topk,
        ivf_build_index,
        ivf_query_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = list(emb.orderBy("vec_id").first()["embedding"])
    idx = str(tmp_path / "ivf")
    cents = ivf_build_index(emb, "vec_id", "embedding", idx, n_centroids=8)
    assert len(cents) == 8

    res = ivf_query_index(spark, idx, q, 10, nprobe=4)
    got = [r["id"] for r in res.collect()]
    exact = [r["id"] for r in cosine_topk(emb, "vec_id", "embedding", q, 10).collect()]
    recall = len(set(got) & set(exact)) / 10
    assert recall >= 0.5, f"IVF recall@10 {recall} too low (nprobe=4/8 cells)"

    # partition pruning evidence: the scan carries a PartitionFilter on
    # centroid (inputFiles() lists pre-pruning, so inspect the plan)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [centroid" in plan and "IN (" in plan


def test_ivf_append_equals_frozen_union(spark, tmp_path):
    """O(delta) IVF append: fold a delta into a base-built index with
    frozen centroids — every query over the merged index must equal an
    index built over the UNION with the same centroids (assignment is a
    pure function of vector × centroids), and the appended files must
    land inside the existing centroid partitions (no re-shuffle of the
    base, pruning still applies)."""
    from crawler_spark.operators.similarity import (
        ivf_append_index,
        ivf_assign,
        ivf_build_index,
        ivf_query_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.where(F.col("vec_id") % 4 != 0)
    delta = emb.where(F.col("vec_id") % 4 == 0)
    idx = str(tmp_path / "ivf_app")
    cents = ivf_build_index(base, "vec_id", "embedding", idx, n_centroids=8)
    ivf_append_index(delta, "vec_id", "embedding", idx)

    # every vector present exactly once, in its frozen-centroid cell
    merged = spark.read.parquet(idx + "/vectors")
    assert merged.count() == emb.count()
    ref = ivf_assign(emb, "vec_id", "embedding", cents).select(
        "id", F.col("centroid").alias("c_ref")
    )
    mism = (
        merged.select("id", "centroid").join(ref, "id")
        .where(F.col("centroid") != F.col("c_ref")).count()
    )
    assert mism == 0

    # query parity across several probes incl. delta-only neighborhoods
    for qid in [r["vec_id"] for r in emb.orderBy("vec_id").limit(3).collect()]:
        q = list(emb.where(F.col("vec_id") == qid).first()["embedding"])
        got = [
            (r["id"], round(r["score"], 6))
            for r in ivf_query_index(spark, idx, q, 10, nprobe=4).collect()
        ]
        # reference: same frozen centroids over the union, no index
        probe = sorted(
            range(len(cents)),
            key=lambda c: (sum((a - b) ** 2 for a, b in zip(q, cents[c])), c),
        )[:4]
        from crawler_spark.operators.similarity import cosine

        sel = ivf_assign(emb, "vec_id", "embedding", cents).where(
            F.col("centroid").isin(probe)
        )
        qcol = F.array(*[F.lit(float(x)) for x in q])
        want = [
            (r["id"], round(r["score"], 6))
            for r in sel.select("id", cosine(F.col("v"), qcol).alias("score"))
            .orderBy(F.col("score").desc(), F.col("id").asc())
            .limit(10)
            .collect()
        ]
        assert got == want, (qid, got, want)


def test_srp_multiprobe_improves_recall(spark):
    """Multi-probe LSH: flipping the query's least-confident hyperplane
    bits probes the buckets a true neighbour most plausibly fell into.
    On a corpus with planted structure (jittered copies at cosine ≈
    0.97) recall@10 must improve monotonically-ish with nprobe and be
    high by nprobe=4; nprobe=1 keeps the old single-bucket semantics."""
    import numpy as np

    from crawler_spark.operators.similarity import ann_topk_srp, cosine_topk

    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i in range(40):
        rows.append((f"b{i:02d}", [float(x) for x in base[i]]))
        for j in range(4):  # 4 planted neighbours per base vector
            v2 = base[i] + 0.03 * rng.normal(size=64)
            v2 /= np.linalg.norm(v2)
            rows.append((f"d{i:02d}_{j}", [float(x) for x in v2]))
    emb = spark.createDataFrame(rows, "id string, embedding array<double>")
    q = rows[0][1]  # query = b00; its 4 jitters are the true neighbours

    exact = [r["id"] for r in cosine_topk(emb, "id", "embedding", q, 5).collect()]
    r1 = [
        r["id"]
        for r in ann_topk_srp(emb, "id", "embedding", q, 5, nprobe=1, ntables=1).collect()
    ]
    r4 = [
        r["id"]
        for r in ann_topk_srp(emb, "id", "embedding", q, 5, nprobe=4, ntables=1).collect()
    ]
    rec1 = len(set(r1) & set(exact)) / 5
    rec4 = len(set(r4) & set(exact)) / 5
    assert rec4 >= rec1
    assert rec4 >= 0.8, f"multi-probe recall {rec4} too low on planted structure"


def test_srp_fast_buckets_match_expression(spark):
    """The Arrow-matmul bucketing (srp_buckets_fast_udf) reproduces the
    column-expression srp_bucket bit for bit on a real corpus (the plane
    signs are recomputed from the identical xxhash64 grid; the sign of a
    projection is normalization-invariant)."""
    import numpy as np

    from crawler_spark.operators.similarity import (
        srp_bucket,
        srp_buckets_fast_udf,
        srp_plane_signs,
        unit_norm,
    )

    rng = np.random.default_rng(5)
    rows = [(f"v{i}", [float(x) for x in rng.normal(size=48)]) for i in range(300)]
    emb = spark.createDataFrame(rows, "id string, embedding array<double>")
    P = srp_plane_signs(spark, 48, 8, 42)
    budf = srp_buckets_fast_udf(P, 8)
    vraw = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    mism = (
        emb.select(
            srp_bucket(unit_norm(F.col("embedding")), bits=8, seed=42).alias("a"),
            F.element_at(budf(vraw), 1).alias("b"),
        )
        .where("a <> b")
        .count()
    )
    assert mism == 0


def test_srp_multi_table_recall(spark):
    """OR-construction over independent hyperplane tables rescues recall
    on a weakly-correlated corpus (the LSH-adversarial case): recall@10
    must rise with ntables and clear 0.6 by 8 tables of 8 probes, while
    single-table stays a per-bucket lottery."""
    import numpy as np

    from crawler_spark.operators.similarity import ann_topk_srp, cosine_topk

    rng = np.random.default_rng(3)
    rows = [(f"v{i:04d}", [float(x) for x in rng.normal(size=64)]) for i in range(2000)]
    emb = spark.createDataFrame(rows, "id string, embedding array<double>").cache()
    recs1, recs8 = [], []
    for qi in (7, 191, 1203):  # average out per-query bucket luck
        q = rows[qi][1]
        exact = [r["id"] for r in cosine_topk(emb, "id", "embedding", q, 10).collect()]
        r1 = [
            r["id"]
            for r in ann_topk_srp(
                emb, "id", "embedding", q, 10, nprobe=8, ntables=1
            ).collect()
        ]
        r8 = [
            r["id"]
            for r in ann_topk_srp(
                emb, "id", "embedding", q, 10, nprobe=8, ntables=8
            ).collect()
        ]
        recs1.append(len(set(r1) & set(exact)) / 10)
        recs8.append(len(set(r8) & set(exact)) / 10)
    rec1 = sum(recs1) / len(recs1)
    rec8 = sum(recs8) / len(recs8)
    assert rec8 >= rec1
    assert rec8 >= 0.5, f"8-table OR-construction recall {rec8} too low ({recs8})"
    emb.unpersist()


def test_srp_default_operating_point(spark):
    """A BARE ann_topk_srp call must not be a recall lottery (VERDICT r3
    #3): the auto-derived defaults (ntables = nprobe = bits, i.e. 8/8)
    must (a) clear 0.5 mean recall@10 even on a UNIFORM random corpus —
    the LSH-adversarial worst case, where true top-10 cosines are ~0.4
    and the old 1/1 default measured 0.1-0.2 — while scanning ≤ ~35% of
    it (candidate fraction, the work bound), and (b) clear 0.8 recall@5
    on a corpus with planted near-neighbour structure (the actual dedup
    workload shape). The driver bench asserts the ≥0.8 @ ≤~25% point on
    the sf embeddings table per round."""
    import numpy as np

    from crawler_spark.operators.similarity import (
        ann_topk_srp, cosine_topk, srp_candidates,
    )

    rng = np.random.default_rng(3)
    rows = [(f"v{i:04d}", [float(x) for x in rng.normal(size=64)]) for i in range(2000)]
    emb = spark.createDataFrame(rows, "id string, embedding array<double>").cache()
    recs, fracs = [], []
    for qi in (7, 191, 1203):
        q = rows[qi][1]
        exact = [r["id"] for r in cosine_topk(emb, "id", "embedding", q, 10).collect()]
        got = [r["id"] for r in ann_topk_srp(emb, "id", "embedding", q, 10).collect()]
        recs.append(len(set(got) & set(exact)) / 10)
        fracs.append(srp_candidates(emb, "id", "embedding", q).count() / 2000)
    emb.unpersist()
    rec = sum(recs) / len(recs)
    frac = sum(fracs) / len(fracs)
    assert rec >= 0.5, f"default-path uniform recall {rec} too low ({recs})"
    assert frac <= 0.35, f"default-path candidate fraction {frac} too high ({fracs})"

    # planted structure: 40 bases × 4 jittered copies at cosine ≈ 0.97
    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    prows = []
    for i in range(40):
        prows.append((f"b{i:02d}", [float(x) for x in base[i]]))
        for j in range(4):
            v2 = base[i] + 0.03 * rng.normal(size=64)
            v2 /= np.linalg.norm(v2)
            prows.append((f"d{i:02d}_{j}", [float(x) for x in v2]))
    pemb = spark.createDataFrame(prows, "id string, embedding array<double>")
    q = prows[0][1]
    exact = [r["id"] for r in cosine_topk(pemb, "id", "embedding", q, 5).collect()]
    got = [r["id"] for r in ann_topk_srp(pemb, "id", "embedding", q, 5).collect()]
    prec = len(set(got) & set(exact)) / 5
    assert prec >= 0.8, f"default-path planted recall {prec} too low"


def test_canonical_text_corpus_every_stage_bites(spark):
    from crawler_spark.plans.corpus import canonical_text_corpus

    base = ("the quick brown fox jumps over the lazy dog while a "
            "crawler engine deduplicates training corpora at scale "
            "and keeps exactly one canonical copy of each document")
    rows = [
        (1, base),                         # cluster rep (min id)
        (2, base),                         # exact dup of 1
        (3, base.replace("lazy", "idle")), # near dup of 1
        (10, "unique enough text about spark shuffles, partitions and "
             "broadcast joins that shares no shingles with the others "
             "beyond incidental stopword overlap in this sentence"),
        (20, "!!! ??? ,,, ;;; ::: ..."),   # gated out by quality < 0.5
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = canonical_text_corpus(df, "doc_id", "text").collect()
    ids = sorted(r["doc_id"] for r in kept)
    assert ids == [1, 10], ids
    assert all(r["quality"] >= 0.5 for r in kept)
