"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single narrow projection (the
dot product is a JVM higher-order-function expression, no Python) plus a
TakeOrderedAndProject; scales linearly and shuffles only k rows.

Scale path: sign-random-projection (SRP) LSH bucketing — deterministic
pseudo-random hyperplanes derived from xxhash64 (no stored model, no
driver-side randomness), so bucketing is reproducible across runs and
engines. Probing the query's bucket (optionally with multi-probe over
neighboring buckets) turns a corpus scan into a partition-pruned lookup
when the table is written partitioned/bucketed by ``bucket``.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a codegen'd higher-order-function expression."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def unit_norm(a: Column) -> Column:
    """L2-normalized copy (doubles); zero vectors stay zero."""
    ad = F.transform(a, lambda x: x.cast("double"))
    n = norm(ad)
    return F.when(n == 0, ad).otherwise(F.transform(ad, lambda x: x / n))


def cosine(a: Column, b: Column) -> Column:
    na, nb = norm(a), norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot(a, b) / (na * nb))


def cosine_topk(
    emb: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    Plans as scan → project → TakeOrderedAndProject: no full sort, no
    wide shuffle; the only data movement is k rows per partition.
    Returns (id, score) ordered by (score desc, id)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (
        emb.select(F.col(id_col).alias("id"), cosine(v, q).alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def _srp_proj(v: Column, i: int, seed: int) -> Column:
    """Projection of v on hyperplane i (xxhash64 ±1 components)."""
    return F.aggregate(
        F.zip_with(
            v,
            F.transform(v, lambda _, j: F.xxhash64(F.lit(seed), F.lit(i), j)),
            lambda x, h: F.when(h.bitwiseAND(F.lit(1)) == 1, x).otherwise(-x),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def srp_bucket(v: Column, *, bits: int = 12, seed: int = 42) -> Column:
    """Sign-random-projection LSH bucket id (int) of a unit vector.

    Hyperplane h_i's j-th component is ±1 derived from xxhash64(seed, i, j)
    — fully deterministic, derivable on any engine, nothing broadcast.
    bucket = Σ (h_i·v > 0) << i."""
    acc = F.lit(0).cast("long")
    for i in range(bits):
        proj = _srp_proj(v, i, seed)
        acc = acc + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return acc


def srp_plane_signs(spark, dim: int, bits: int, seed: int):
    """±1 hyperplane components IDENTICAL to ``_srp_proj``'s xxhash64
    signs, as a (bits × dim) numpy matrix. One scalar-scale Spark job
    (bits·dim rows — metadata, not data): the grid recomputes
    xxhash64(seed, i, j) with the same int types the column expression
    hashes, so buckets from the vectorized path below equal
    ``srp_bucket``'s bit for bit (asserted in tests)."""
    import numpy as np

    rows = (
        spark.range(bits * dim)
        .select(
            (F.col("id") / dim).cast("int").alias("i"),
            (F.col("id") % dim).cast("int").alias("j"),
        )
        .select(
            "i", "j",
            (F.xxhash64(F.lit(seed), F.col("i"), F.col("j")).bitwiseAND(F.lit(1)) == 1)
            .alias("pos"),
        )
        .collect()
    )
    P = np.empty((bits, dim), dtype=np.float64)
    for r in rows:
        P[r["i"], r["j"]] = 1.0 if r["pos"] else -1.0
    return P


def srp_buckets_fast_udf(planes, bits: int):
    """Vectorized SRP bucketing: ONE Arrow batch matmul computes every
    table's bucket for every row — the 100-TB path. The column-expression
    form (``srp_bucket``) expands to O(tables·bits·dim) Catalyst nodes
    per row; measured on a 2k-row corpus the 4-table expression plan
    costs ~50s of analysis/codegen alone, while this UDF is
    data-bound. ``planes`` is the vstack of ``srp_plane_signs`` matrices
    (tables·bits × dim); returns array<long>, one bucket per table.
    Sign rule (proj > 0 → bit set) matches srp_bucket; normalization is
    irrelevant to the sign, so raw vectors give the same buckets the
    unit-norm expression path computes."""
    import numpy as np

    weights = (1 << np.arange(bits, dtype=np.int64))

    @F.pandas_udf("array<long>")
    def _buckets(vs: pd.Series) -> pd.Series:
        M = np.array(vs.tolist(), dtype=np.float64)  # (n, dim)
        proj = M @ planes.T  # (n, tables*bits)
        pos = proj > 0
        n_tables = planes.shape[0] // bits
        out = np.empty((len(vs), n_tables), dtype=np.int64)
        for t in range(n_tables):
            out[:, t] = pos[:, t * bits:(t + 1) * bits] @ weights
        return pd.Series(list(out))

    return _buckets


def srp_bucket_md5(v: Column, *, bits: int = 8, seed: int = 42) -> Column:
    """SRP bucket with md5-parity hyperplane signs — identical blocking
    semantics to ``srp_bucket`` but computable in ANSI SQL/DuckDB, which
    lets the driver oracle recompute the buckets independently. Sign of
    component j of hyperplane i = parity of the last hex digit of
    md5('<seed>_<i>_<j>'). Production keeps ``srp_bucket`` (xxhash64)."""
    acc = F.lit(0).cast("long")
    for i in range(bits):
        proj = _srp_proj_md5(v, i, seed)
        acc = acc + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return acc


def _srp_proj_md5(v: Column, i: int, seed: int) -> Column:
    """Projection of v on md5-parity hyperplane i (srp_bucket_md5)."""
    def _sign_lambda(prefix):
        def f(_, j):
            return F.when(
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(prefix), j.cast("string"))), 32, 1),
                    16, 10,
                ).cast("int") % 2 == 1,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
        return f

    signs = F.transform(v, _sign_lambda(f"{seed}_{i}_"))
    return F.aggregate(
        F.zip_with(v, signs, lambda x, s: x * s), F.lit(0.0), lambda a, x: a + x
    )


def _sq_dist(v: Column, cent: list[float]) -> Column:
    c = F.array(*[F.lit(float(x)) for x in cent])
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a - b) * (a - b)), F.lit(0.0), lambda s, x: s + x
    )


def ivf_assign(emb: DataFrame, id_col: str, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """(id, v, centroid): nearest-centroid assignment as pure column
    logic (argmin over k literal centroid arrays)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    e = emb.select(F.col(id_col).alias("id"), v.alias("v"))
    dists = F.array(*[_sq_dist(F.col("v"), c) for c in centroids])
    return e.withColumn("centroid", (F.array_position(dists, F.array_min(dists)) - 1).cast("int"))


def ivf_train(
    emb: DataFrame, id_col: str, vec_col: str, *, k: int = 16, iters: int = 2
) -> list[list[float]]:
    """Deterministic mini k-means: init = first k vectors by id, then
    ``iters`` Lloyd steps, each ONE scan + ONE groupBy(centroid) whose
    per-dimension sums partial-aggregate map-side — only k×(dim+1)
    values cross the shuffle (vs n×dim rows for an explode-by-dimension
    plan). k×dim floats come back to the driver — the 'model' is tiny
    and ships as plan literals."""
    cents = [
        [float(x) for x in r[vec_col]]
        for r in emb.orderBy(id_col).limit(k).collect()
    ]
    dim = len(cents[0])
    for _ in range(iters):
        assigned = ivf_assign(emb, id_col, vec_col, cents)
        rows = (
            assigned.groupBy("centroid")
            .agg(
                F.count("*").alias("n"),
                *[F.sum(F.col("v")[d]).alias(f"s{d}") for d in range(dim)],
            )
            .collect()
        )
        new = {
            r["centroid"]: [r[f"s{d}"] / r["n"] for d in range(dim)] for r in rows
        }
        cents = [new.get(ci, cents[ci]) for ci in range(k)]
    return cents


def ivf_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    *,
    centroids: Optional[list[list[float]]] = None,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: score only vectors assigned to the
    query's ``nprobe`` nearest centroids.

    With the corpus written partitioned by ``centroid``, the scan prunes
    to nprobe/k of the data; the probe-list is computed driver-side
    (k×dim floats). Returns (id, score) by cosine."""
    if centroids is None:
        centroids = ivf_train(emb, id_col, vec_col, k=n_centroids)
    q = [float(x) for x in query_vec]
    d2 = [sum((a - b) ** 2 for a, b in zip(q, c)) for c in centroids]
    probe = sorted(range(len(centroids)), key=lambda i: d2[i])[:nprobe]
    assigned = ivf_assign(emb, id_col, vec_col, centroids)
    qcol = F.array(*[F.lit(x) for x in q])
    return (
        assigned.where(F.col("centroid").isin(probe))
        .select("id", cosine(F.col("v"), qcol).alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def ivf_build_index(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    index_path: str,
    *,
    n_centroids: int = 16,
    iters: int = 2,
) -> list[list[float]]:
    """Build + persist the IVF index ONCE: train centroids (one scan per
    Lloyd iteration), assign every vector, and write the corpus
    partitioned by ``centroid`` plus a tiny centroids table. Queries then
    pay a *pruned scan of nprobe partitions* instead of re-training per
    call (the weakness of calling ivf_topk without centroids).

    Layout (Iceberg-partition semantics over parquet):
        <index_path>/vectors/centroid=<c>/…   (id, v)
        <index_path>/centroids/               (centroid, cv)
    """
    spark = emb.sparkSession
    cents = ivf_train(emb, id_col, vec_col, k=n_centroids, iters=iters)
    assigned = ivf_assign(emb, id_col, vec_col, cents)
    (
        assigned.repartition("centroid")
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(index_path + "/vectors")
    )
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "centroid int, cv array<double>",
    ).write.mode("overwrite").parquet(index_path + "/centroids")
    return cents


def ivf_append_index(
    delta: DataFrame,
    id_col: str,
    vec_col: str,
    index_path: str,
) -> None:
    """Fold a delta batch into a persisted IVF index at O(delta) cost —
    the ANN analog of the crawl-batch index folds (LSMPhashIndex, the
    seen-set LSM): assign the delta to the EXISTING centroids (frozen —
    read back from the tiny centroids table, no retrain, no base scan)
    and append its parquet files under the matching centroid
    partitions. Queries see base ∪ delta transparently through the same
    pruned scan, and results equal an index built over the union with
    the same centroids BY CONSTRUCTION: assignment is a pure function
    of (vector, centroids). Centroid drift under sustained appends is
    the caller's cadence decision — periodically re-run
    `ivf_build_index` (the compaction discipline)."""
    spark = delta.sparkSession
    rows = spark.read.parquet(index_path + "/centroids").collect()
    cents = [list(r["cv"]) for r in sorted(rows, key=lambda r: r["centroid"])]
    assigned = ivf_assign(delta, id_col, vec_col, cents)
    (
        assigned.repartition("centroid")
        .write.mode("append")
        .partitionBy("centroid")
        .parquet(index_path + "/vectors")
    )


def ivf_query_index(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    *,
    nprobe: int = 4,
) -> DataFrame:
    """Query a persisted IVF index: read the k×dim centroids table
    (driver-side scalars), pick the ``nprobe`` nearest cells, and scan
    ONLY their partitions — ``centroid`` is a partition column, so the
    filter prunes at the file-listing level (verify with .explain():
    PartitionFilters: [centroid IN (…)]). Returns (id, score)."""
    cents = {
        r["centroid"]: list(r["cv"])
        for r in spark.read.parquet(index_path + "/centroids").collect()
    }
    q = [float(x) for x in query_vec]
    d2 = {c: sum((a - b) ** 2 for a, b in zip(q, cv)) for c, cv in cents.items()}
    probe = sorted(d2, key=lambda c: (d2[c], c))[:nprobe]
    vecs = spark.read.parquet(index_path + "/vectors").where(F.col("centroid").isin(probe))
    qcol = F.array(*[F.lit(x) for x in q])
    return (
        vecs.select("id", cosine(F.col("v"), qcol).alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def ann_topk_srp(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    *,
    bits: int = 8,
    seed: int = 42,
    bucket_hash: str = "xxhash64",
    nprobe: int | None = None,
    ntables: int | None = None,
    _candidates_only: bool = False,
) -> DataFrame:
    """Approximate top-k: score only rows in the query's SRP bucket(s).

    With the corpus written partitioned by bucket, the scan prunes to the
    probed partitions (the probe set is a literal IN-list per table —
    partition-prunable at file-listing level). Recall is traded via three
    orthogonal knobs:

    * ``bits`` — fewer bits → bigger buckets → higher recall, more work;
    * ``nprobe`` — multi-probe LSH: also search the buckets reached by
      flipping the query's LEAST CONFIDENT hyperplane bits (smallest
      |projection| — where a true neighbour most plausibly landed on the
      other side), ranked by total flipped |projection|;
    * ``ntables`` — OR-construction over independent hyperplane tables
      (plane set t uses seed + 7919·t): a neighbour is a candidate if it
      collides in ANY table. Per-table collision at cosine s is
      p = (1 - arccos(s)/π)^bits; across L tables 1-(1-p)^L — the knob
      that rescues recall when per-table p is small. The near-dup
      operator (embedding_near_dups) uses the same construction.

    ``nprobe``/``ntables`` DEFAULT to ``bits`` each (8/8 at the default
    8 bits) — the measured ≥0.8-recall@10 operating point on a uniform
    (LSH-adversarial) corpus at ≤~25% candidate fraction. A bare
    single-table single-probe call is a recall lottery on uniform data
    (measured 0.1-0.2); callers wanting that cheaper point must ask for
    it explicitly. More bits shrink buckets, so scaling L and the probe
    count with ``bits`` keeps the candidate fraction roughly flat.

    All query-side projections (ntables × bits) cost ONE scalar Spark
    job. Returns (id, score).

    ``bucket_hash="md5"`` buckets on the raw double vector with
    md5-parity hyperplanes (srp_bucket_md5) — sign-equivalent blocking
    (SRP signs are scale-invariant) that a SQL oracle can recompute."""
    from itertools import combinations

    import math

    import numpy as np

    if ntables is None:
        ntables = bits
    if nprobe is None:
        nprobe = bits
    seeds = [seed + 7919 * t for t in range(max(1, ntables))]
    un = unit_norm(F.col(vec_col))
    vraw = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    qn = [float(x) / n for x in query_vec]
    q = F.array(*[F.lit(x) for x in qn])
    if bucket_hash == "md5":
        # oracle-recomputable face: column-expression buckets + a scalar
        # Spark job for the query projections (kept expression-form so
        # the DuckDB oracle mirrors the exact plan semantics)
        e = emb.select(
            F.col(id_col).alias("id"),
            un.alias("v"),
            *[
                srp_bucket_md5(vraw, bits=bits, seed=sd)
                .alias(f"bucket{t}" if t else "bucket")
                for t, sd in enumerate(seeds)
            ],
        )
        qv = F.array(*[F.lit(float(x)) for x in query_vec])
        pr = (
            emb.sparkSession.range(1)
            .select(
                *[
                    _srp_proj_md5(qv, i, sd).alias(f"p{t}_{i}")
                    for t, sd in enumerate(seeds)
                    for i in range(bits)
                ]
            )
            .first()
        )
        all_projs = {
            t: [float(pr[f"p{t}_{i}"]) for i in range(bits)] for t in range(len(seeds))
        }
    else:
        # production face: one Arrow-batched matmul buckets every table
        # at once (see srp_buckets_fast_udf — the expression form costs
        # O(tables·bits·dim) Catalyst nodes); query projections come
        # from the same plane matrices driver-side
        planes = np.vstack(
            [srp_plane_signs(emb.sparkSession, len(query_vec), bits, sd) for sd in seeds]
        )
        budf = srp_buckets_fast_udf(planes, bits)
        e = emb.select(
            F.col(id_col).alias("id"), un.alias("v"), budf(vraw).alias("_bkts")
        ).select(
            "id", "v",
            *[
                F.element_at("_bkts", t + 1).alias(f"bucket{t}" if t else "bucket")
                for t in range(len(seeds))
            ],
        )
        qarr = np.array(qn, dtype=np.float64)
        all_projs = {
            t: [
                float(x)
                for x in planes[t * bits:(t + 1) * bits] @ qarr
            ]
            for t in range(len(seeds))
        }
    cond = None
    for t, _sd in enumerate(seeds):
        projs = all_projs[t]
        base = sum(1 << i for i in range(bits) if projs[i] > 0)
        if nprobe <= 1:
            probes = [base]
        else:
            # enumerate flip-sets over the m least-confident bits, ranked
            # by total |projection| flipped (canonical multi-probe order)
            order = sorted(range(bits), key=lambda i: abs(projs[i]))
            m = min(bits, max(4, (max(nprobe - 1, 1)).bit_length() + 2))
            cand = order[:m]
            scored = sorted(
                (sum(abs(projs[i]) for i in s), s)
                for r in range(0, len(cand) + 1)
                for s in combinations(cand, r)
            )[:nprobe]
            probes = [base ^ sum(1 << i for i in s) for _, s in scored]
        c = F.col(f"bucket{t}" if t else "bucket").isin([int(p) for p in probes])
        cond = c if cond is None else (cond | c)
    cand = e.where(cond)
    if _candidates_only:
        return cand.select("id", "v")
    return (
        cand.select("id", dot(F.col("v"), q).alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def srp_candidates(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    **kwargs,
) -> DataFrame:
    """The (id, unit-vector) candidate set ``ann_topk_srp`` would score
    for this query — the measurement seam for candidate fraction
    (|candidates| / |corpus|), which bounds the operator's work at any
    scale. Same knobs/defaults as ``ann_topk_srp``."""
    return ann_topk_srp(
        emb, id_col, vec_col, query_vec, _candidates_only=True, **kwargs
    )


# --------------------------------------------------------------------- #
# Hamming-ranked signature prefilter (r5) — the uniform-corpus ANN path
# --------------------------------------------------------------------- #
# Bucketed SRP (above) shines when near neighbours are genuinely close
# (near-dup regime, cos >= 0.9): collisions concentrate and the probed
# buckets partition-prune. On a UNIFORM corpus whose true top-k sit in
# the bulk of the cosine distribution (the benchmark table: rank-10 at
# cos ~0.31 vs rank-50 at ~0.24), bucket OR-constructions provably trade
# recall 1:1 against candidate mass (measured: 0.75 recall at 26%
# candidates, 0.37 at 5% — tools/srp_operating_point.py). The scalable
# answer is a WIDE signature ranked by Hamming distance:
#
#   * each vector -> `bits` sign bits packed into bits/64 longs
#     (512 bits = 64 B/row vs 512 B of float64s — an 8x smaller
#     secondary index a 100 TB corpus can afford to scan);
#   * per query, hamming(sig, qsig) is pure JVM xor+bit_count over 8
#     longs — no Python, no shuffle, whole-stage codegen;
#   * candidates = rows inside a hamming radius chosen analytically
#     from the binomial null (radius mode, a static streaming filter —
#     the 100 TB path), or the global top-M (topm mode, small corpora);
#   * candidates are re-ranked by exact cosine; only they touch the
#     full-width vectors.
#
# Measured on the sf0.1 table (tools/srp_operating_point.py --hamming):
# 512 bits @ 2% candidates -> recall@10 0.90; @5% -> 0.95; 1024 bits
# @5% -> 1.0 (vs the bucketed default's 0.75 @ 26%).

def srp_sign_planes(dim: int, bits: int, seed: int = 42):
    """Deterministic GAUSSIAN hyperplane matrix (bits × dim) from md5 —
    platform-stable (no RNG state), computed driver-side and shipped
    inside the Arrow UDF closure (bits·dim·8 bytes — metadata, not
    data).  Gaussian (not ±1) entries matter: on anisotropic embeddings
    ±1-component planes produce correlated projections, which widens the
    hamming null far past Binom(bits, ½) and breaks the analytic radius
    (measured: the ±1 form selected 16% of the corpus at the "2%"
    radius).  Each entry: 8 md5 bytes → uniform(0,1) → Φ⁻¹ via erfinv
    bisection-free rational approx (scipy-free)."""
    import hashlib

    import numpy as np

    need = bits * dim
    words = np.empty(need, dtype=np.uint64)
    # 2 uint64 per md5 digest
    for c in range((need + 1) // 2):
        h = hashlib.md5(f"srp:{seed}:{c}".encode()).digest()
        words[2 * c] = int.from_bytes(h[:8], "little")
        if 2 * c + 1 < need:
            words[2 * c + 1] = int.from_bytes(h[8:], "little")
    u = (words.astype(np.float64) + 0.5) / 2.0**64  # uniform in (0,1)
    P = _phi_inv(u).reshape(bits, dim)
    return P


def _phi_inv(u):
    """Vectorized inverse normal CDF (Acklam's rational approximation —
    |rel err| < 1.15e-9, plenty for hash-derived hyperplanes)."""
    import numpy as np

    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    u = np.asarray(u, dtype=np.float64)
    x = np.empty_like(u)
    plow, phigh = 0.02425, 1 - 0.02425
    lo = u < plow
    hi = u > phigh
    mid = ~(lo | hi)
    if lo.any():
        q = np.sqrt(-2 * np.log(u[lo]))
        x[lo] = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    if hi.any():
        q = np.sqrt(-2 * np.log(1 - u[hi]))
        x[hi] = -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    if mid.any():
        q = u[mid] - 0.5
        r = q * q
        x[mid] = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
            ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
        )
    return x


def hamming_sig_udf(planes):
    """Vectorized signature builder: one Arrow-batch matmul + packbits.
    ``planes`` is the (bits × dim) ±1 matrix; returns array<long> of
    bits/64 packed words (bit j of word w = sign of plane 64w+j)."""
    import numpy as np

    bits = planes.shape[0]
    assert bits % 64 == 0, "bits must pack into whole longs"
    nlongs = bits // 64
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    @F.pandas_udf("array<long>")
    def _sig(vs: pd.Series) -> pd.Series:
        M = np.array(vs.tolist(), dtype=np.float64)
        pos = (M @ planes.T) > 0  # (n, bits)
        out = np.empty((len(vs), nlongs), dtype=np.uint64)
        for w in range(nlongs):
            out[:, w] = pos[:, w * 64:(w + 1) * 64].astype(np.uint64) @ weights
        return pd.Series(list(out.view(np.int64)))

    return _sig


def _pack_query_sig(planes, query_vec):
    import numpy as np

    bits = planes.shape[0]
    nlongs = bits // 64
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    pos = (planes @ np.asarray(query_vec, dtype=np.float64)) > 0
    return [
        int(np.int64((pos[w * 64:(w + 1) * 64].astype(np.uint64) @ weights).view(np.int64)))
        for w in range(nlongs)
    ]


def hamming_distance(sig: Column, qsig: list[int]) -> Column:
    """Σ bit_count(sig[w] xor qsig[w]) — codegen'd, no Python."""
    q = F.array(*[F.lit(int(w)).cast("long") for w in qsig])
    return F.aggregate(
        F.zip_with(sig, q, lambda a, b: F.bit_count(a.bitwiseXOR(b))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def hamming_radius_for_frac(bits: int, frac: float) -> int:
    """Radius whose binomial-null mass ≈ ``frac``: on data uncorrelated
    with the query, hamming ~ Binom(bits, 1/2); the normal-approx
    quantile gives a STATIC threshold selecting ~frac of the corpus with
    zero extra jobs (the streaming 100 TB filter)."""
    import math

    # inverse normal CDF via erfinv-free approximation (Acklam) is
    # overkill; a small bisection on erf is exact enough here
    lo, hi = -10.0, 10.0
    for _ in range(80):
        mid = (lo + hi) / 2
        if 0.5 * (1 + math.erf(mid / math.sqrt(2))) < frac:
            lo = mid
        else:
            hi = mid
    z = (lo + hi) / 2
    return max(0, int(bits / 2 + z * math.sqrt(bits) / 2))


def hamming_signatures(
    emb: DataFrame, id_col: str, vec_col: str, *, bits: int = 512, seed: int = 42,
    dim: Optional[int] = None,
) -> DataFrame:
    """(id, sig) signature table — persist this (parquet/Iceberg) as the
    64 B/row secondary index; queries then scan IT, not the vectors."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    planes = srp_sign_planes(dim, bits, seed)
    vraw = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return emb.select(
        F.col(id_col).alias("id"), hamming_sig_udf(planes)(vraw).alias("sig")
    )


def ann_hamming_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    *,
    bits: int = 512,
    frac: float = 0.02,
    seed: int = 42,
    mode: str = "topm",
    radius: Optional[int] = None,
    corpus_size: Optional[int] = None,
    _candidates_only: bool = False,
) -> DataFrame:
    """Approximate top-k via Hamming-ranked signatures + exact rerank.

    ``mode="topm"`` (default): candidates = global top max(5k, frac·n)
    by hamming — EXACT fraction control regardless of the corpus's
    cosine distribution; a distributed k-selection (per-partition top-M
    then merge), one count job unless ``corpus_size`` is given.
    ``mode="radius"``: candidates = hamming ≤ ``radius`` — a static,
    pushdown-able streaming filter (the 100 TB path: pick the radius
    ONCE per persisted signature index from a sample quantile; if
    ``radius`` is None a ``frac``-quantile approxQuantile job derives
    it).  The analytic Binom(bits, ½) radius
    (``hamming_radius_for_frac``) is only correct for corpora whose
    cosine-to-query distribution is centred at 0 with negligible tail —
    on the benchmark table its "2%" radius admits ~15% because the
    corpus has a heavy positive-cosine tail, which is WHY the quantile
    (not the null) is the production radius source.
    Returns (id, score) like the other ANN faces."""
    import math

    dim = len(query_vec)
    planes = srp_sign_planes(dim, bits, seed)
    qsig = _pack_query_sig(planes, query_vec)
    n = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    qn = F.array(*[F.lit(float(x) / n) for x in query_vec])
    vraw = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    e = emb.select(
        F.col(id_col).alias("id"),
        unit_norm(F.col(vec_col)).alias("v"),
        hamming_distance(hamming_sig_udf(planes)(vraw), qsig).alias("ham"),
    )
    if mode == "radius":
        if radius is None:
            radius = int(e.approxQuantile("ham", [frac], 0.001)[0])
        cand = e.where(F.col("ham") <= F.lit(int(radius)))
    else:
        if corpus_size is None:
            corpus_size = emb.count()
        m = max(5 * k, int(frac * corpus_size))
        cand = e.orderBy(F.col("ham").asc(), F.col("id").asc()).limit(m)
    if _candidates_only:
        return cand.select("id", "v")
    return (
        cand.select("id", dot(F.col("v"), qn).alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def hamming_candidates(
    emb: DataFrame, id_col: str, vec_col: str, query_vec: list[float], **kwargs
) -> DataFrame:
    """Candidate set of ``ann_hamming_topk`` (fraction measurement seam)."""
    return ann_hamming_topk(
        emb, id_col, vec_col, query_vec, _candidates_only=True, **kwargs
    )


def hamming_index_build(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    index_path: str,
    *,
    bits: int = 512,
    seed: int = 42,
) -> None:
    """Persist the signature SECONDARY INDEX: (id, sig, vec) parquet —
    sig is bits/64 packed longs (64 B at 512 bits vs 512 B of float64s),
    and the unit-normalized vector rides alongside so the rerank stage
    reads only candidate rows.  At 100 TB the query-time scan touches
    the sig column ONLY (columnar pruning: ReadSchema shows id+sig until
    the rerank join), an 8× I/O cut vs scanning vectors; appending a
    crawl delta is a plain parquet append of its signed rows (planes are
    deterministic from (bits, seed) — nothing to retrain, the O(delta)
    property the IVF/LSM indexes share)."""
    dim = len(emb.select(vec_col).first()[0])
    planes = srp_sign_planes(dim, bits, seed)
    vraw = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    (
        emb.select(
            F.col(id_col).alias("id"),
            hamming_sig_udf(planes)(vraw).alias("sig"),
            unit_norm(F.col(vec_col)).alias("vec"),
        )
        .write.mode("overwrite")
        .parquet(index_path)
    )
    # tiny meta table: (bits, seed, dim) so queries re-derive the planes
    emb.sparkSession.createDataFrame(
        [(bits, seed, dim)], "bits int, seed int, dim int"
    ).write.mode("overwrite").parquet(index_path.rstrip("/") + "_meta")


def hamming_index_append(
    delta: DataFrame, id_col: str, vec_col: str, index_path: str
) -> None:
    """O(delta) fold: sign the delta with the index's own (bits, seed)
    planes and append — no base scan, no retrain."""
    spark = delta.sparkSession
    meta = spark.read.parquet(index_path.rstrip("/") + "_meta").first()
    planes = srp_sign_planes(meta["dim"], meta["bits"], meta["seed"])
    vraw = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    (
        delta.select(
            F.col(id_col).alias("id"),
            hamming_sig_udf(planes)(vraw).alias("sig"),
            unit_norm(F.col(vec_col)).alias("vec"),
        )
        .write.mode("append")
        .parquet(index_path)
    )


def hamming_query_index(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    *,
    frac: float = 0.02,
    mode: str = "topm",
    radius: Optional[int] = None,
    corpus_size: Optional[int] = None,
) -> DataFrame:
    """Query a persisted signature index: rank by JVM xor+bit_count over
    the sig column (vectors untouched until the rerank of the top
    ``frac``), then exact-cosine rerank.  Same mode semantics as
    ``ann_hamming_topk``; returns (id, score)."""
    import math

    meta = spark.read.parquet(index_path.rstrip("/") + "_meta").first()
    planes = srp_sign_planes(meta["dim"], meta["bits"], meta["seed"])
    qsig = _pack_query_sig(planes, query_vec)
    n = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    qn = F.array(*[F.lit(float(x) / n) for x in query_vec])
    idx = spark.read.parquet(index_path)
    e = idx.select("id", "vec", hamming_distance(F.col("sig"), qsig).alias("ham"))
    if mode == "radius":
        if radius is None:
            radius = int(
                idx.select(hamming_distance(F.col("sig"), qsig).alias("ham"))
                .approxQuantile("ham", [frac], 0.001)[0]
            )
        cand = e.where(F.col("ham") <= F.lit(int(radius)))
    else:
        if corpus_size is None:
            corpus_size = idx.count()
        m = max(5 * k, int(frac * corpus_size))
        cand = e.orderBy(F.col("ham").asc(), F.col("id").asc()).limit(m)
    return (
        cand.select("id", dot(F.col("vec"), qn).alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )
