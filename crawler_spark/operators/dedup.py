"""Corpus deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, and embedding-cosine near-dup.

The reference's near-dup machinery is the simhash fingerprint + BK-tree
radius search (sample/fingerprint/fingerprint.go:12-115,
sample/bktree/bktree.go:21-62) used by its example controller to cancel
hosts serving >50% near-duplicate pages. Here the same capabilities are
first-class batch operators for a training-data pipeline at corpus scale.

Design for 100 TB:
  * all hashing is ``F.xxhash64`` — JVM-side, whole-stage codegen; no
    Python in any hot path.
  * MinHash: one explode of distinct shingles per doc, then ``k`` min
    aggregations in a single groupBy (map-side partial aggregation does
    most of the work before the shuffle).
  * LSH banding turns the O(n²) pair space into an equi-join on
    (band_id, band_hash) — shuffle is hash-partitioned on band keys, and
    huge buckets (degenerate bands) are capped to bound worst-case skew.
  * SimHash: explode tokens → 64 conditional-sum aggregates → bit
    reassembly; near-dup = Hamming radius via bit_count(xor) with a
    band-prefix join to avoid the cross product.
  * exact dedup is a groupBy on a 128-bit content fingerprint.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.functions.text import char_shingles, fingerprint_md5


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Small inputs often arrive as 1-2 partitions (one parquet file per
    table at test SFs); the explode stages below blow each row up ~500x,
    so a single-partition source serializes megarows onto one core.
    Repartition narrow inputs up to the cluster's parallelism — a
    no-op at production scale where sources are already well-split."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


# --------------------------------------------------------------------- #
# exact
# --------------------------------------------------------------------- #
def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Representative (min id) per exact normalized-text fingerprint.

    Returns (fp, keep_id, n_dups). One shuffle, partial-aggregated.
    """
    return (
        df.select(fingerprint_md5(F.col(text_col)).alias("fp"), F.col(id_col).alias("id"))
        .groupBy("fp")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("n_dups"))
    )


def distinct_docs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The deduplicated corpus: rows whose id is the representative."""
    keep = exact_dedup(df, id_col, text_col).select(F.col("keep_id").alias(id_col))
    return df.join(keep, id_col, "inner")


# --------------------------------------------------------------------- #
# MinHash + LSH
# --------------------------------------------------------------------- #
def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 32, shingle_n: int = 3,
    feature_hash: str = "xxhash64",
) -> DataFrame:
    """(id, sig: array[k]) — k independent min-hashes of the document's
    distinct character shingles.

    Each hash_i(s) = xxhash64(i, s); min over shingles per doc. A single
    explode + one groupBy with k partial-aggregated mins.

    ``feature_hash="md5"`` swaps the hash family for
    ``min(md5('<i>_' || shingle))`` over *strings* — arithmetically
    identical MinHash semantics (min of a uniform hash per permutation),
    chosen because md5 is computable in ANSI SQL/DuckDB, which makes the
    operator independently verifiable by the driver's oracle. The
    xxhash64 family stays the production default (8-byte values vs
    32-byte strings through the shuffle)."""
    df = _ensure_parallelism(df)
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(char_shingles(F.col(text_col), shingle_n))).alias("sh"),
    )
    if feature_hash == "md5":
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{i}_"), F.col("sh")))).alias(f"h{i}")
            for i in range(k)
        ]
    else:
        aggs = [F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"h{i}") for i in range(k)]
    sig = sh.groupBy("id").agg(*aggs)
    return sig.select("id", F.array(*[f"h{i}" for i in range(k)]).alias("sig"))


def _eager(df: DataFrame) -> DataFrame:
    """Populate a persisted table BEFORE fan-out. A lazily-persisted
    DataFrame consumed by several branches of one job computes its
    subtree once per branch — the cache only lands after the first
    materialization finishes, and a self-join's two sides (or the 6-8
    consumers of the group tables here) race past it. One scalar count()
    job pins the cache first; every consumer then reads it."""
    df.count()
    return df


def _sig_groups(sig: DataFrame):
    """Collapse identical signatures into groups: returns
    (groups = (sig, gid) one row per DISTINCT signature vector with
    gid = min member id, mem = (id, gid, gsz) membership with group
    size, tagged = the persisted window-tag table BOTH derive from —
    callers that consume groups/mem eagerly should unpersist it).

    This is the distinct-value reduction of the Hamming join applied to
    LSH: exact-duplicate documents (the most common duplicate type)
    share a signature, so a value with c copies becomes ONE banded join
    row instead of c rows in every band bucket — and, crucially, its
    pairs can never be lost to the degenerate-bucket cap, because
    equal-signature pairs are emitted by a separate output-bound equi
    self-join that bypasses banding entirely.

    Physical shape: ONE window-tag pass (min id over partitionBy(sig))
    persisted, from which both views derive without further exchanges —
    a groupBy+join formulation would re-shuffle the (KB-scale for the
    md5 oracle family) signature arrays once per consumer; measured 2.7x
    slower on the sf0.1 bench entry."""
    w = Window.partitionBy("sig")
    tagged = _eager(
        sig.withColumn("gid", F.min("id").over(w))
        .withColumn("gsz", F.count(F.lit(1)).over(w))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    groups = tagged.where(F.col("id") == F.col("gid")).select("gid", "sig")
    mem = tagged.select("id", "gid", "gsz")
    return groups, mem, tagged


def _expand_group_pairs(cand: DataFrame, mem: DataFrame, extra: tuple = ()) -> DataFrame:
    """(gid_a, gid_b[, extra]) group-pairs → (id_a, id_b[, extra]) member
    pairs, id_a < id_b. Groups are disjoint id sets, so expansion
    introduces no duplicate pairs."""
    return (
        cand.join(mem.select(F.col("gid").alias("gid_a"), F.col("id").alias("ia")), "gid_a")
        .join(mem.select(F.col("gid").alias("gid_b"), F.col("id").alias("ib")), "gid_b")
        .select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            *extra,
        )
    )


def _equal_sig_pairs(mem: DataFrame, extra: tuple = ()) -> DataFrame:
    """All (id_a < id_b) pairs inside each identical-signature group —
    output-bound (these pairs ARE the result for exact dups); never
    subject to banding or the bucket cap."""
    return (
        mem.select("gid", F.col("id").alias("id_a"))
        .join(mem.select("gid", F.col("id").alias("id_b")), "gid")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", *extra)
    )


def lsh_candidate_pairs(
    sig: DataFrame, *, bands: int = 8, rows: int = 4, max_bucket: int = 1000,
    feature_hash: str = "xxhash64",
) -> DataFrame:
    """Candidate near-dup pairs from banded minhash signatures.

    bands×rows must equal the signature length. Pairs (id_a < id_b) that
    collide in ≥1 band. Banding runs over DISTINCT signature vectors
    (`_sig_groups`): equal-signature pairs are always returned (they
    collide in every band by definition, and are produced by an
    output-bound self-join instead of the banded one), so ``max_bucket``
    now only drops buckets where > max_bucket DIFFERENT signatures
    collide in one band — genuine hash degeneracy, the operator's
    documented coverage cap."""
    groups, mem, _tagged = _sig_groups(sig)
    b = _banded(groups.select(F.col("gid").alias("id"), "sig"),
                bands=bands, rows=rows, max_bucket=max_bucket,
                feature_hash=feature_hash)
    left = b.select(F.col("band"), F.col("bh"), F.col("id").alias("gid_a"))
    right = b.select(F.col("band"), F.col("bh"), F.col("id").alias("gid_b"))
    cand = (
        left.join(right, ["band", "bh"])
        .where(F.col("gid_a") < F.col("gid_b"))
        .select("gid_a", "gid_b")
        .distinct()
    )
    return _expand_group_pairs(cand, mem).union(_equal_sig_pairs(mem))


def _banded(
    sig: DataFrame, *, bands: int, rows: int, max_bucket: int,
    feature_hash: str, carry: tuple = (),
) -> DataFrame:
    """(id, band, bh[, carry...]) band rows with oversized buckets removed.

    The bucket-size cap used to be a count-window over every band row —
    a full shuffle + sort of the banded table. Oversized buckets are by
    construction RARE (they are the degenerate signatures the cap
    exists to drop), so the scale-correct plan is: partial-aggregated
    bucket counts, filter to the oversized few, and a broadcast
    left-anti join — no sort anywhere, and the anti-join's build side is
    a handful of (band, bh) keys no matter how large the corpus is."""
    if feature_hash == "md5":
        def band_hash(i):
            return F.md5(F.concat_ws("|", *[F.col("sig")[i * rows + j] for j in range(rows)]))
    else:
        def band_hash(i):
            return F.xxhash64(*[F.col("sig")[i * rows + j] for j in range(rows)])
    b = sig.select(
        "id",
        *carry,
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band"), band_hash(i).alias("bh"))
                for i in range(bands)
            ])
        ).alias("e"),
    ).select("id", *carry, "e.band", "e.bh")
    big = (
        b.groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > max_bucket)
        .select("band", "bh")
    )
    return b.join(F.broadcast(big), ["band", "bh"], "left_anti")


def minhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 32,
    bands: int = 8,
    rows: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.6,
    feature_hash: str = "xxhash64",
    max_bucket: int = 1000,
) -> DataFrame:
    """End-to-end MinHash near-dup: signatures → LSH candidates →
    signature-estimated Jaccard filter. Returns (id_a, id_b, est_jaccard).

    Physical plan notes (the 100 TB shape): the signature table is the
    expensive subtree (shingle explode + k map-side mins), so it is
    computed ONCE — persisted MEMORY_AND_DISK (n_docs × (k+1) compact
    columns, a tiny fraction of the corpus) instead of being re-derived
    by every consumer branch. Banding runs over DISTINCT signature
    vectors (`_sig_groups`): an exact-duplicate clique collapses to one
    banded row, its hamming-0 analog — the equal-signature pairs
    (est_jaccard 1.0 by definition) — comes from an output-bound equi
    self-join that the degenerate-bucket cap can never drop (previously
    a clique larger than max_bucket lost ALL its pairs: every one of
    its band buckets was over the cap). Signatures ride THROUGH the
    banded self-join (both sides share one exchange, reused by Spark),
    so the Jaccard estimate needs no further joins; the estimate is a
    codegen'd higher-order function over the two carried arrays, and
    pair dedup (`distinct`) runs on the smaller group-pair set BEFORE
    member expansion.

    Storage lifecycle: the returned pair DataFrame is LAZY and reads
    the persisted window-tag table, so this function cannot release it;
    the blocks free on LRU eviction or JVM GC of the plan. An eager
    consumer that wants deterministic release (the corpus faces,
    clustering) should use `minhash_group_pairs`, which hands back the
    persisted handle."""
    sig = minhash_signatures(df, id_col, text_col, k=k, shingle_n=shingle_n,
                             feature_hash=feature_hash)
    # sig's only consumer is the window-tag pass; _sig_groups persists
    # (and eagerly pins) the tagged table every downstream branch reads
    groups, mem, _tagged = _sig_groups(sig)
    cand = _minhash_group_cand(groups, k=k, bands=bands, rows=rows,
                               threshold=threshold, feature_hash=feature_hash,
                               max_bucket=max_bucket)
    est = _expand_group_pairs(cand, mem, extra=("est_jaccard",))
    if threshold <= 1.0:
        est = est.union(
            _equal_sig_pairs(mem, extra=(F.lit(1.0).alias("est_jaccard"),))
        )
    return est


def _minhash_group_cand(
    groups: DataFrame, *, k: int, bands: int, rows: int, threshold: float,
    feature_hash: str, max_bucket: int,
) -> DataFrame:
    """Qualifying GROUP pairs (gid_a < gid_b, est_jaccard ≥ threshold)
    from banded distinct-signature groups — the shared core of
    `minhash_near_dups` (which expands to member pairs) and
    `minhash_group_pairs` (which hands the group graph straight to
    clustering)."""
    b = _banded(groups.select(F.col("gid").alias("id"), "sig"),
                bands=bands, rows=rows, max_bucket=max_bucket,
                feature_hash=feature_hash, carry=("sig",))
    left = b.select("band", "bh", F.col("id").alias("gid_a"), F.col("sig").alias("sig_a"))
    right = b.select("band", "bh", F.col("id").alias("gid_b"), F.col("sig").alias("sig_b"))
    cand = (
        left.join(right, ["band", "bh"])
        .where(F.col("gid_a") < F.col("gid_b"))
        .withColumn(
            "est_jaccard",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            / F.lit(k),
        )
        .where(F.col("est_jaccard") >= threshold)
        # a group-pair colliding in several bands repeats with the SAME
        # estimate (a function of the two signatures alone), so distinct
        # on the triple is exact pair dedup
        .select("gid_a", "gid_b", "est_jaccard")
        .distinct()
    )
    return cand


def minhash_group_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 32,
    bands: int = 8,
    rows: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.6,
    feature_hash: str = "xxhash64",
    max_bucket: int = 1000,
):
    """The group-reduced face of `minhash_near_dups` for eager consumers
    (clustering, canonical-corpus): returns ``(gpairs, mem, tagged)``
    where

      * ``gpairs`` = (gid_a, gid_b, est_jaccard) — ONE edge per
        qualifying pair of DISTINCT signature vectors, labeled by the
        groups' min member id;
      * ``mem`` = (id, gid, gsz) membership with group size;
      * ``tagged`` = the persisted window-tag table both derive from —
        the caller MUST unpersist it once its consumers materialize.

    Equal-signature pairs carry no edge: group membership IS that
    information (every member of a group lands in one cluster), so the
    O(Σ clique²) member-pair expansion — which dominates both the pair
    table and the clustering input on boilerplate-heavy corpora — never
    happens. ``threshold`` must be ≤ 1.0 (equal signatures always
    qualify; a >1.0 threshold would need them filtered out, which the
    group representation cannot express)."""
    if threshold > 1.0:
        raise ValueError("minhash_group_pairs requires threshold <= 1.0")
    sig = minhash_signatures(df, id_col, text_col, k=k, shingle_n=shingle_n,
                             feature_hash=feature_hash)
    groups, mem, tagged = _sig_groups(sig)
    cand = _minhash_group_cand(groups, k=k, bands=bands, rows=rows,
                               threshold=threshold, feature_hash=feature_hash,
                               max_bucket=max_bucket)
    return cand, mem, tagged


# --------------------------------------------------------------------- #
# exact n-gram Jaccard (the oracle for MinHash, and an operator itself)
# --------------------------------------------------------------------- #
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int = 10000,
) -> DataFrame:
    """Exact Jaccard similarity over distinct character n-grams for every
    pair sharing ≥1 shingle. Returns (id_a, id_b, jaccard).

    Scale: the shingle self-join is bounded by dropping shingles that
    occur in > max_shingle_freq docs (ultra-common n-grams contribute
    almost nothing to discrimination but dominate join fan-out), and the
    join runs over DISTINCT texts: an exact-duplicate clique collapses
    to one row per side (its pairs — jaccard 1.0 by definition — come
    from an output-bound self-join), so boilerplate duplicated 10^5
    times costs group-size, not group-size² · shingles, join rows.
    Document frequency stays row-weighted (a shingle in c copies of one
    text still counts c), so the cap's shingle selection is byte-exact
    with the per-row plan."""
    df = _ensure_parallelism(df)
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text")) \
        .where(F.size(char_shingles(F.col("text"), shingle_n)) > 0)
    groups = base.groupBy("text").agg(
        F.min("id").alias("gid"), F.count(F.lit(1)).alias("gsize"))
    mem = _eager(base.join(groups, "text").select("id", "gid")
                 .persist(StorageLevel.MEMORY_AND_DISK))
    sh = groups.select(
        F.col("gid").alias("id"),
        "gsize",
        F.explode(F.array_distinct(char_shingles(F.col("text"), shingle_n))).alias("sh"),
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    freq = sh.groupBy("sh").agg(F.sum("gsize").alias("df_"))
    sh2 = sh.join(freq.where(F.col("df_") <= max_shingle_freq).select("sh"), "sh")
    inter = (
        sh2.select(F.col("id").alias("id_a"), "sh")
        .join(sh2.select(F.col("id").alias("id_b"), "sh"), "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    cand = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .withColumn("jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
        .where(F.col("jaccard") >= threshold)
        .select(F.col("id_a").alias("gid_a"), F.col("id_b").alias("gid_b"), "jaccard")
    )
    out = _expand_group_pairs(cand, mem, extra=("jaccard",))
    if threshold <= 1.0:
        out = out.union(
            _equal_sig_pairs(mem, extra=(F.lit(1.0).alias("jaccard"),))
        )
    return out


# --------------------------------------------------------------------- #
# SimHash
# --------------------------------------------------------------------- #
def simhash(df: DataFrame, id_col: str, text_col: str, *, shingle_n: int = 3,
            feature_hash: str = "xxhash64") -> DataFrame:
    """64-bit SimHash per document (fingerprint.go:12-115 semantics:
    per-feature 64-bit hashes vote per bit; bit set iff positive sum).

    Implementation: explode features → one groupBy with 64 conditional
    sums (partial-aggregated map-side) → bit reassembly. Returns
    (id, simhash:long).

    ``feature_hash="md5"`` derives the 64-bit feature hash from the first
    16 hex chars of md5 (bit b read out of hex digit ``15 - b//4``) — an
    SQL-expressible family so the DuckDB oracle can recompute the exact
    fingerprints; xxhash64 stays the production default."""
    df = _ensure_parallelism(df)
    feats = df.select(
        F.col(id_col).alias("id"),
        F.explode(char_shingles(F.col(text_col), shingle_n)).alias("ft"),
    )
    if feature_hash == "md5":
        feats = feats.withColumn("m", F.md5("ft"))

        def bit(b):
            # value = int(md5_hex[0:16], 16); bit b lives in the hex digit
            # at 1-based position 16 - b//4, at in-digit offset b % 4
            digit = F.conv(F.substring(F.col("m"), 16 - b // 4, 1), 16, 10).cast("int")
            return F.shiftright(digit, b % 4).bitwiseAND(F.lit(1))
    else:
        feats = feats.withColumn("h", F.xxhash64("ft"))

        def bit(b):
            return F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))

    aggs = [
        F.sum(F.when(bit(b) == 1, 1).otherwise(-1)).alias(f"b{b}")
        for b in range(64)
    ]
    votes = feats.groupBy("id").agg(*aggs)
    acc = F.lit(0).cast("long")
    for b in range(64):
        acc = acc + F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63))).otherwise(F.lit(0).cast("long"))
    return votes.select("id", acc.alias("simhash"))


def simhash_near_dups(sh: DataFrame, *, radius: int = 3,
                      max_bucket: int = 4096) -> DataFrame:
    """Hamming-radius pairs over (id, simhash) — the BK-tree radius query
    (bktree.go:21-62) as a join. Returns (id_a, id_b, hamming). EXACT
    (every pair within radius is returned; no recall cap), with three
    guards that keep the plan skew-proof at corpus scale:

    1. **Distinct-hash reduction.** Blocking runs over DISTINCT hash
       values, not rows. Real perceptual-hash corpora are dominated by
       exact-equal fingerprints (blank frames, boilerplate pages); a
       value with 10^5 copies would otherwise sit in every one of its
       blocks' buckets and pay a 10^10 within-bucket blowup. Equal-hash
       pairs (hamming 0) are recovered by one output-bound equi
       self-join; cross-hash pairs expand back through two id joins.
    2. **Pigeonhole level 1.** The 64 bits split into ``radius+1``
       disjoint blocks; two hashes within Hamming radius r must agree
       *exactly* on ≥1 block, so candidates are an equi-join on
       (block_id, block_value).
    3. **Two-level refinement for heavy buckets.** A level-1 bucket
       holding > ``max_bucket`` distinct hashes (correlated-bit skew —
       natural-image pHash bits are far from uniform) is neither dropped
       (that would lose pairs) nor joined directly (quadratic). Its rows
       re-pigeonhole the 64−w complement bits — packed contiguous by
       cutting the agreed block out of the hash — into ``radius+1``
       sub-blocks: a qualifying pair inside the bucket has all ≤r
       differing bits in the complement, so it must also agree exactly
       on ≥1 sub-block. The candidate join for heavy buckets keys on
       (block, value, sub_block, sub_value) — roughly double the key
       entropy. Heavy keys are found by a partial-aggregated count and
       broadcast (rare by construction, the `_banded` technique), so the
       split costs no sort and no extra full-table shuffle.

    Storage lifecycle: the returned pair DataFrame is LAZY over the
    persisted distinct-hash table (and `_hamming_cand`'s heavy-key
    set), so release is LRU/GC-driven; eager consumers wanting
    deterministic release should use `simhash_group_pairs`.
    """
    # 8-byte keys: the distinct-hash table and the id joins are cheap to
    # derive lazily inside ONE job (no window/eager barriers — those
    # are worth it only for the KB-scale array keys of the minhash
    # path, and cost three serialized job boundaries here)
    members = sh.select("id", "simhash")
    dh = members.select("simhash").distinct().persist(StorageLevel.MEMORY_AND_DISK)
    cand = _hamming_cand(dh, radius=radius, max_bucket=max_bucket)
    cross = (
        cand.join(members.select(F.col("simhash").alias("h_a"),
                                 F.col("id").alias("ia")), "h_a")
        .join(members.select(F.col("simhash").alias("h_b"),
                             F.col("id").alias("ib")), "h_b")
        .select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            "hamming",
        )
    )
    eq_pairs = (
        members.select("simhash", F.col("id").alias("id_a"))
        .join(members.select("simhash", F.col("id").alias("id_b")), "simhash")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.lit(0).cast("integer").alias("hamming"))
    )
    return cross.select("id_a", "id_b", "hamming").union(eq_pairs)


def _pigeonhole_specs(radius: int) -> list:
    """Level-1 pigeonhole block layout for 64-bit Hamming-radius joins:
    ``radius+1`` disjoint bit-windows as (block_id, shift, bits) — two
    hashes within radius r differ in ≤r bits, so they agree EXACTLY on
    at least one of the r+1 blocks. Shared by `_hamming_cand` (batch
    self-join) and the incremental index (delta→base bucket probing);
    both sides of any probe MUST use the same layout."""
    blocks = min(radius + 1, 32)
    width = 64 // blocks
    specs = []  # (block_id, shift, bits)
    for i in range(blocks):
        bits = width + (64 - width * blocks if i == blocks - 1 else 0)
        specs.append((i, i * width, bits))
    return specs


def _block_explode(dh: DataFrame, hash_col: str, specs: list) -> DataFrame:
    """(hash, blk, bv) — one row per level-1 block of each hash."""
    return dh.select(
        hash_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("blk"),
                    F.shiftright(F.col(hash_col), shift)
                    .bitwiseAND(F.lit((1 << bits) - 1) if bits < 64 else F.lit(-1))
                    .alias("bv"),
                )
                for (i, shift, bits) in specs
            ])
        ).alias("e"),
    ).select(hash_col, "e.blk", "e.bv")


def _hamming_cand(dh: DataFrame, *, radius: int, max_bucket: int) -> DataFrame:
    """Qualifying DISTINCT-hash pairs (h_a < h_b, hamming ≤ radius) from
    a (simhash) table of distinct hash values — the shared skew-proof
    two-level pigeonhole core of `simhash_near_dups` (which expands to
    member pairs) and `simhash_group_pairs` (which hands the hash-group
    graph straight to clustering). ``dh`` should already be persisted
    (its plan is consumed by several branches of one job)."""
    specs = _pigeonhole_specs(radius)
    blocks = len(specs)
    width = specs[0][2]

    dex = _block_explode(dh, "simhash", specs)

    heavy_keys = (
        dex.groupBy("blk", "bv")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > max_bucket)
        .select("blk", "bv")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    light = dex.join(F.broadcast(heavy_keys), ["blk", "bv"], "left_anti")
    light_pairs = (
        light.select("blk", "bv", F.col("simhash").alias("h_a"))
        .join(light.select("blk", "bv", F.col("simhash").alias("h_b")), ["blk", "bv"])
        .where(F.col("h_a") < F.col("h_b"))
        .select("h_a", "h_b")
    )

    # Complement packing: cut block i's bit-window out of the hash so the
    # remaining 64−bits positions are contiguous — low bits stay, high
    # bits shift down by the window width (unsigned; sign bit is data).
    comp = None
    for (i, shift, bits) in specs:
        lowmask = (1 << shift) - 1
        if shift == 0:
            expr = F.shiftrightunsigned(F.col("simhash"), bits)
        else:
            expr = (
                F.col("simhash").bitwiseAND(F.lit(lowmask))
                .bitwiseOR(
                    F.shiftrightunsigned(F.col("simhash"), bits)
                    .bitwiseAND(F.lit(~lowmask))
                )
            )
        comp = (F.when(F.col("blk") == i, expr) if comp is None
                else comp.when(F.col("blk") == i, expr))
    # Sub-blocks over the minimum complement width; the last sub-block is
    # open-ended (plain shift) so any extra high bits of a wider
    # complement ride in it — one uniform expression for every blk.
    cw = width * (blocks - 1)
    swidth = max(1, cw // (radius + 1))

    def sub_val(j):
        if j < radius:
            return (F.shiftrightunsigned(F.col("comp"), j * swidth)
                    .bitwiseAND(F.lit((1 << swidth) - 1)))
        return F.shiftrightunsigned(F.col("comp"), radius * swidth)

    hsub = (
        dex.join(F.broadcast(heavy_keys), ["blk", "bv"], "left_semi")
        .withColumn("comp", comp)
        .select(
            "blk", "bv", "simhash",
            F.explode(
                F.array(*[
                    F.struct(F.lit(j).alias("sblk"), sub_val(j).alias("sbv"))
                    for j in range(radius + 1)
                ])
            ).alias("e"),
        )
        .select("blk", "bv", "simhash", "e.sblk", "e.sbv")
    )
    heavy_pairs = (
        hsub.select("blk", "bv", "sblk", "sbv", F.col("simhash").alias("h_a"))
        .join(
            hsub.select("blk", "bv", "sblk", "sbv", F.col("simhash").alias("h_b")),
            ["blk", "bv", "sblk", "sbv"],
        )
        .where(F.col("h_a") < F.col("h_b"))
        .select("h_a", "h_b")
    )

    cand = (
        light_pairs.union(heavy_pairs)
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .where(F.col("hamming") <= radius)
        # a pair may collide in several (possibly mixed light/heavy)
        # blocks; hamming is a function of the two hashes, so distinct
        # on the triple is exact pair dedup — and it runs BEFORE the id
        # expansion, on the (smaller) distinct-hash pair set
        .distinct()
    )
    return cand


def simhash_group_pairs(sh: DataFrame, *, radius: int = 3,
                        max_bucket: int = 4096):
    """The group-reduced face of `simhash_near_dups` for eager consumers
    (clustering, canonical-corpus): returns ``(gpairs, mem, tagged)``
    where

      * ``gpairs`` = (gid_a, gid_b, hamming) — ONE edge per qualifying
        pair of DISTINCT hash values (hamming ≤ radius), labeled by the
        hash groups' min member id;
      * ``mem`` = (id, gid, gsz) membership with group size;
      * ``tagged`` = the persisted window-tag table both derive from —
        the caller MUST unpersist it once its consumers materialize.

    Equal-hash (hamming-0) pairs carry no edge: group membership IS that
    information, so the O(Σ clique²) member-pair expansion — blank
    frames and boilerplate thumbnails at corpus scale — never reaches
    the clustering input."""
    w = Window.partitionBy("simhash")
    tagged = _eager(
        sh.select("id", "simhash")
        .withColumn("gid", F.min("id").over(w))
        .withColumn("gsz", F.count(F.lit(1)).over(w))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    hg = tagged.where(F.col("id") == F.col("gid")).select("simhash", "gid")
    mem = tagged.select("id", "gid", "gsz")
    cand = _hamming_cand(hg.select("simhash"), radius=radius,
                         max_bucket=max_bucket)
    gpairs = (
        cand.join(hg.select(F.col("simhash").alias("h_a"),
                            F.col("gid").alias("ga")), "h_a")
        .join(hg.select(F.col("simhash").alias("h_b"),
                        F.col("gid").alias("gb")), "h_b")
        .select(
            F.least("ga", "gb").alias("gid_a"),
            F.greatest("ga", "gb").alias("gid_b"),
            "hamming",
        )
    )
    return gpairs, mem, tagged


# --------------------------------------------------------------------- #
# embedding cosine near-dup
# --------------------------------------------------------------------- #
def embedding_near_dups(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float = 0.95,
    srp_bits: int = 8,
    n_tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Multi-table SRP-LSH blocking (the standard OR-construction): each of
    ``n_tables`` independent sign-random-projection tables hashes a unit
    vector to a ``srp_bits``-bit bucket; a pair is a candidate if it
    collides in ≥1 table, and only candidates are cosine-scored (a JVM
    higher-order-function expression). A single 12-bit table has ~0.28
    recall at cosine 0.95 (collision prob (1−θ/π)^bits, θ≈0.318 rad) —
    the defaults here give 1−(1−p^8)^6 ≈ 0.96 expected recall, measured
    ≥0.95 on the planted-dup corpus in tests/test_text_dedup.py.

    Hashing and candidate joins run over DISTINCT raw vectors (the same
    reduction as the Hamming and LSH joins): a vector embedded for 10^5
    identical images collides with itself in EVERY table — a quadratic
    within-bucket blowup for pairs known by construction. Those pairs
    come instead from an output-bound equi self-join scored by the
    group vector's self-cosine (1.0, or NaN for zero vectors, which the
    threshold filter then drops exactly as the per-row plan did).
    Returns (id_a, id_b, cosine)."""
    from crawler_spark.operators.similarity import srp_bucket, unit_norm

    raw = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("rv"))
    groups = raw.groupBy("rv").agg(F.min("id").alias("gid"))
    mem = _eager(raw.join(groups, "rv").select("id", "gid")
                 .persist(StorageLevel.MEMORY_AND_DISK))
    e = _eager(groups.select(F.col("gid").alias("id"),
                             unit_norm(F.col("rv")).alias("v"))
               .persist(StorageLevel.MEMORY_AND_DISK))
    tables = F.array(*[
        F.struct(
            F.lit(t).alias("tbl"),
            srp_bucket(F.col("v"), bits=srp_bits, seed=seed + t).alias("bkt"),
        )
        for t in range(n_tables)
    ])
    b = e.select("id", F.explode(tables).alias("e")).select("id", "e.tbl", "e.bkt")
    cand = (
        b.select("tbl", "bkt", F.col("id").alias("gid_a"))
        .join(b.select("tbl", "bkt", F.col("id").alias("gid_b")), ["tbl", "bkt"])
        .where(F.col("gid_a") < F.col("gid_b"))
        .select("gid_a", "gid_b")
        .distinct()
    )
    va = e.select(F.col("id").alias("gid_a"), F.col("v").alias("v_a"))
    vb = e.select(F.col("id").alias("gid_b"), F.col("v").alias("v_b"))
    dot = F.aggregate(
        F.zip_with("v_a", "v_b", lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    scored = (
        cand.join(va, "gid_a")
        .join(vb, "gid_b")
        .withColumn("cosine", dot)
        .where(F.col("cosine") >= threshold)
        .select("gid_a", "gid_b", "cosine")
    )
    self_dot = F.aggregate(
        F.zip_with("v", "v", lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    gscore = e.select(F.col("id").alias("gid"), self_dot.alias("cosine")) \
        .where(F.col("cosine") >= threshold)
    eq = (
        mem.select("gid", F.col("id").alias("id_a"))
        .join(mem.select("gid", F.col("id").alias("id_b")), "gid")
        .where(F.col("id_a") < F.col("id_b"))
        .join(gscore, "gid")
        .select("id_a", "id_b", "cosine")
    )
    return _expand_group_pairs(scored, mem, extra=("cosine",)).union(eq)
