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
