"""Hamming-ranked signature ANN (similarity.py r5): signature packing
correctness, JVM hamming vs python popcount, candidate monotonicity, and
rerank exactness when the candidate set provably covers top-k."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.similarity import (
    _pack_query_sig,
    ann_hamming_topk,
    cosine_topk,
    hamming_candidates,
    hamming_distance,
    hamming_sig_udf,
    hamming_signatures,
    srp_sign_planes,
)


def _toy_emb(spark, n=80, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, dim))
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    rows = [(f"v{i:03d}", [float(x) for x in M[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "id string, embedding array<double>"), M


def test_planes_deterministic_and_gaussian():
    P1 = srp_sign_planes(16, 128, seed=9)
    P2 = srp_sign_planes(16, 128, seed=9)
    assert np.array_equal(P1, P2)
    assert not np.array_equal(P1, srp_sign_planes(16, 128, seed=10))
    # Gaussian-ish: mean ~0, std ~1 over 2048 entries
    assert abs(P1.mean()) < 0.1 and abs(P1.std() - 1.0) < 0.1


def test_signature_matches_query_packer(spark):
    """The Arrow UDF's packed signature of a vector equals the driver's
    _pack_query_sig of the same vector — one sign rule everywhere."""
    emb, M = _toy_emb(spark)
    planes = srp_sign_planes(16, 128, seed=42)
    sigs = {
        r["id"]: list(r["sig"])
        for r in hamming_signatures(emb, "id", "embedding", bits=128).collect()
    }
    for i in (0, 7, 41):
        assert sigs[f"v{i:03d}"] == _pack_query_sig(planes, M[i]), i


def test_jvm_hamming_equals_popcount(spark):
    emb, M = _toy_emb(spark, n=30)
    planes = srp_sign_planes(16, 128, seed=42)
    q = M[3]
    qsig = _pack_query_sig(planes, q)
    got = {
        r["id"]: r["ham"]
        for r in emb.select(
            "id",
            hamming_distance(
                hamming_sig_udf(planes)(
                    F.transform("embedding", lambda x: x.cast("double"))
                ),
                qsig,
            ).alias("ham"),
        ).collect()
    }
    pos = (M @ planes.T) > 0
    qpos = (planes @ q) > 0
    for i in range(30):
        assert got[f"v{i:03d}"] == int((pos[i] != qpos).sum()), i


def test_topm_fraction_and_rerank_exactness(spark):
    """topm candidates = exactly max(5k, frac·n) rows; and with frac=1
    the output IS the exact brute-force top-k."""
    emb, M = _toy_emb(spark)
    q = [float(x) for x in M[0]]
    cand = hamming_candidates(emb, "id", "embedding", q, bits=128, frac=0.5, corpus_size=80)
    assert cand.count() == 50  # floor(0.5*80) = 40 < 5k=50 -> floor wins
    exact = [(r["id"], round(r["score"], 6)) for r in cosine_topk(emb, "id", "embedding", q, 10).collect()]
    got = [
        (r["id"], round(r["score"], 6))
        for r in ann_hamming_topk(
            emb, "id", "embedding", q, 10, bits=128, frac=1.0, corpus_size=80
        ).collect()
    ]
    assert got == exact


def test_radius_mode_streaming_filter(spark):
    """Explicit-radius mode is a plain filter: every candidate is within
    the radius, and radius=bits admits everything."""
    emb, M = _toy_emb(spark, n=40)
    q = [float(x) for x in M[1]]
    allc = hamming_candidates(
        emb, "id", "embedding", q, bits=128, mode="radius", radius=128
    )
    assert allc.count() == 40
    tight = hamming_candidates(
        emb, "id", "embedding", q, bits=128, mode="radius", radius=20
    ).count()
    assert tight < 40  # a 20/128 radius cannot admit a uniform corpus


def test_recall_on_planted_neighbors(spark):
    """Planted near-dups (cos≈0.99) must be found at the DEFAULT
    operating point — the regime where signatures are near-identical."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(200, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(f"b{i:03d}", [float(x) for x in base[i]]) for i in range(200)]
    q = base[0] + 0.05 * rng.normal(size=32)
    q /= np.linalg.norm(q)
    emb = spark.createDataFrame(rows, "id string, embedding array<double>")
    got = [r["id"] for r in ann_hamming_topk(emb, "id", "embedding", [float(x) for x in q], 1).collect()]
    assert got == ["b000"]


def test_persisted_index_roundtrip(spark, tmp_path):
    """build → query equals the inline operator; append folds a delta at
    O(delta) and queries see base ∪ delta."""
    from crawler_spark.operators.similarity import (
        ann_hamming_topk,
        hamming_index_append,
        hamming_index_build,
        hamming_query_index,
    )

    emb, M = _toy_emb(spark, n=60)
    base = emb.where(F.col("id") < "v040")
    delta = emb.where(F.col("id") >= "v040")
    path = str(tmp_path / "sigidx")
    hamming_index_build(base, "id", "embedding", path, bits=128)
    q = [float(x) for x in M[2]]
    got_base = [
        (r["id"], round(r["score"], 6))
        for r in hamming_query_index(spark, path, q, 5, frac=1.0).collect()
    ]
    want_base = [
        (r["id"], round(r["score"], 6))
        for r in ann_hamming_topk(base, "id", "embedding", q, 5, bits=128, frac=1.0).collect()
    ]
    assert got_base == want_base
    hamming_index_append(delta, "id", "embedding", path)
    got_all = [
        (r["id"], round(r["score"], 6))
        for r in hamming_query_index(spark, path, q, 5, frac=1.0).collect()
    ]
    want_all = [
        (r["id"], round(r["score"], 6))
        for r in ann_hamming_topk(emb, "id", "embedding", q, 5, bits=128, frac=1.0).collect()
    ]
    assert got_all == want_all


def test_index_scan_prunes_vector_column(spark, tmp_path):
    """The ranking scan must read ONLY (id, sig) — the vec column joins
    in after candidate selection (check ReadSchema in the plan)."""
    from crawler_spark.operators.similarity import (
        hamming_distance,
        hamming_index_build,
        srp_sign_planes,
        _pack_query_sig,
    )

    emb, M = _toy_emb(spark, n=30)
    path = str(tmp_path / "sigidx2")
    hamming_index_build(emb, "id", "embedding", path, bits=128)
    planes = srp_sign_planes(16, 128, 42)
    qsig = _pack_query_sig(planes, M[0])
    idx = spark.read.parquet(path)
    ranked = idx.select("id", hamming_distance(F.col("sig"), qsig).alias("ham"))
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    # the pruned scan lists id and sig but NOT vec
    assert "vec" not in plan.split("ReadSchema")[1][:200], plan
