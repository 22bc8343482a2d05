"""Connected components over near-duplicate pair graphs.

Every near-dup operator in this engine (minhash_near_dups,
simhash_near_dups, phash near-dups, embedding_near_dups) returns PAIRS;
an actual dedup pass needs CLUSTERS — the transitive closure of the
pair relation — so that "keep one copy per group" keeps exactly one
copy even when A~B and B~C but A and C never collided directly. The
reference reaches the same end state serially: its BK-tree controller
(example from sample/fingerprint + sample/bktree) folds each new
fingerprint into the nearest existing cluster one document at a time;
here the batch equivalent is a distributed connected-components pass.

Algorithm: min-label propagation with pointer doubling (the standard
PRAM shortcutting trick, cf. Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — public literature). Each round:

  1. propagate  — comp(u) := min(comp(u), min over neighbors comp(v))
  2. shortcut   — comp(u) := comp(comp(u))   (pointer doubling)

Labels are node ids, start at comp(u)=u, only ever decrease, and are
bounded below by the component minimum, so the fixpoint assigns every
node its component's minimum id. Propagation alone needs diameter(d)
rounds; the shortcut step halves the effective pointer depth each
round, giving O(log d) rounds total — a path of a million nodes
converges in ~20 rounds, not a million.

Design for 100 TB:
  * per round: one partial-aggregated groupBy(u).min (map-side combine
    absorbs high-degree skew) + two hash joins on the label table — no
    sorts, no windows, no driver-side data.
  * the edge table is symmetrized + deduped ONCE, repartitioned on the
    join key, and persisted — the cached hash(v) partitioning satisfies
    every round's propagate join, so the |E|-scale side is shuffled
    exactly once for the whole job; each round moves only the
    |V|-scale label table.
  * labels are localCheckpoint'd per round to truncate the iterative
    lineage, and the PREVIOUS round's checkpoint blocks are released as
    soon as the new generation materializes (the same superstep
    discipline as the crawl engine — see state/ckpt.py; labels are
    |nodes|-scale, so letting O(log d) generations pile up in executor
    storage until a JVM GC is a real cost at 10^10 nodes).
  * the only driver round-trip is one scalar per round for the
    convergence test (labels only decrease, so an unchanged checksum of
    sum(comp) == fixpoint) — and it rides the checkpoint's own
    materializing job via ``observe()`` rather than paying a second
    label-table scan, so each round is exactly ONE job. O(log d)
    scalar reads for the whole loop, never row data.
"""

from __future__ import annotations

import itertools

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from crawler_spark.state.ckpt import release_checkpoint

#: Observation names must be unique per SparkSession; a process-wide
#: counter keeps repeated calls (tests, bench loops) collision-free.
_obs_ids = itertools.count()


def _symmetrized_edges(e: DataFrame) -> DataFrame:
    """The (u, v) edge table symmetrized, deduped, hash(v)-partitioned
    and persisted — the static side of every propagation round.

    ONE setup shuffle, keyed by v: rows sharing (u, v) share a v, so
    HashPartitioning(v) already satisfies distinct()'s clustering and
    the dedup aggregate runs exchange-free on top of the repartition.
    The payoff is that the CACHED table carries hash(v) partitioning
    into every round's sym⋈labels join — the |E|-scale side never
    reshuffles again; only the |V|-scale label table moves, O(log d)
    times. (Pinned by the plan assertion in tests/test_components.py.)
    """
    return (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .repartition(F.col("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    *,
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """(id, component) for every node appearing in ``pairs``; component
    is the minimum node id reachable via the undirected pair relation.

    Deterministic; self-loop pairs are ignored. ``max_iter`` bounds the
    doubling loop (50 rounds covers diameters beyond 2^40 — hitting it
    means a broken convergence invariant, so it raises rather than
    returning partial labels). Pass a dict as ``stats`` to receive
    {"rounds": <rounds run including the converged one>}.
    """
    e = pairs.select(
        F.col(src_col).cast("long").alias("u"),
        F.col(dst_col).cast("long").alias("v"),
    ).where(F.col("u") != F.col("v"))
    sym = _symmetrized_edges(e)
    # labels only decrease, so sum(comp) strictly decreases every
    # non-fixpoint round; an unchanged sum IS convergence (cheaper than
    # a change-count join). decimal(38,0) so the checksum cannot
    # overflow at any node count. The checksum is attached with
    # observe(), so the eager checkpoint's materializing job computes
    # it in passing — no second scan, one job per round.
    _checksum = F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
    _obs_id = next(_obs_ids)
    obs0 = Observation(f"cc_{_obs_id}_init")
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .observe(obs0, _checksum)
        .localCheckpoint()
    )
    prev_sum = obs0.get["s"]
    for round_no in range(1, max_iter + 1):
        if stats is not None:
            stats["rounds"] = round_no
        nbr_min = (
            sym.join(
                labels.select(F.col("id").alias("v"), F.col("comp").alias("vc")), "v"
            )
            .groupBy("u")
            .agg(F.min("vc").alias("nc"))
            .select(F.col("u").alias("id"), "nc")
        )
        l1 = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least(F.col("comp"), F.coalesce(F.col("nc"), F.col("comp"))).alias("comp"),
        )
        # shortcut: comp := comp(comp). every comp value is a node id,
        # so the self-join always matches; left+coalesce keeps the plan
        # total even so. (A second shortcut per round was measured and
        # rejected: on the dense near-dup group graphs the round count
        # is PROPAGATION-bound — labels travel graph edges, not pointer
        # chains — so doubling the shortcut left rounds at 6/6 and paid
        # an extra labels-scale join per round, 9.0s → 12.8s on the
        # sf0.1 doc group graph.)
        parent = l1.select(F.col("id").alias("comp"), F.col("comp").alias("cc"))
        obs = Observation(f"cc_{_obs_id}_r{round_no}")
        l2 = (
            l1.join(parent, "comp", "left")
            .select("id", F.coalesce(F.col("cc"), F.col("comp")).alias("comp"))
            .observe(obs, _checksum)
            .localCheckpoint()
        )
        cur_sum = obs.get["s"]
        # l2 is materialized (the eager checkpoint, which also carried
        # the checksum out): the previous generation's node-scale blocks
        # can be freed NOW instead of waiting for a JVM GC — storage
        # stays at one generation across the whole O(log d) loop
        release_checkpoint(labels)
        labels = l2
        if cur_sum == prev_sum:
            sym.unpersist()
            return labels.select("id", F.col("comp").alias("component"))
        prev_sum = cur_sum
    sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(labels are monotone, so this indicates a bug, not slow input)"
    )


#: Edge-count gate for the driver union-find path: 100k edges ≈ 1.6 MB
#: of longs — comfortably one driver batch, far below broadcast-join
#: thresholds.
SMALL_GRAPH_MAX_EDGES = 100_000


def components_auto(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    *,
    small_max: int = SMALL_GRAPH_MAX_EDGES,
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """`connected_components` with a size-gated small-graph strategy.

    The distributed label-propagation loop costs O(log d) rounds of
    multi-stage jobs — the right shape for corpus-scale graphs, but
    pure fixed latency on the DELTA-scale contracted graphs the
    incremental dedup index folds (a few thousand edges pay ~10 job
    walls). When the (self-loop-free) edge set fits in one driver batch
    (≤ ``small_max`` edges), run a driver-side union-find instead —
    the same cost-model rule as broadcast-join selection: metadata-
    bounded sides move to the cheapest executor, everything else stays
    distributed. Identical output by construction (min-id union-find =
    the loop's fixpoint); pinned by the forced-crossover equality test
    in tests/test_incremental.py.

    The gate itself is one ``take(small_max+1)`` job over the persisted
    edge set: on small graphs it doubles as the collect; on big graphs
    it computes only the first partitions, which the distributed path
    then reuses from cache. ``stats`` gains {"driver_uf": True,
    "rounds": 0} on the small path.
    """
    e = (
        pairs.select(
            F.col(src_col).cast("long").alias("u"),
            F.col(dst_col).cast("long").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rows = e.take(small_max + 1) if small_max > 0 else None
    if small_max > 0 and len(rows) <= small_max:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for r in rows:
            u, v = r["u"], r["v"]
            if u not in parent:
                parent[u] = u
            if v not in parent:
                parent[v] = v
            ru, rv = find(u), find(v)
            if ru != rv:
                # union by MIN id: the root is always the component min,
                # so find() yields exactly the distributed fixpoint label
                if ru < rv:
                    parent[rv] = ru
                else:
                    parent[ru] = rv
        out = [(x, find(x)) for x in parent]
        if stats is not None:
            stats["rounds"] = 0
            stats["driver_uf"] = True
        res = pairs.sparkSession.createDataFrame(
            out, "id long, component long"
        )
        e.unpersist()
        return res
    res = connected_components(e, "u", "v", max_iter=max_iter, stats=stats)
    e.unpersist()
    return res


def grouped_labels(
    gpairs: DataFrame, mem: DataFrame,
    src_col: str = "gid_a", dst_col: str = "gid_b",
) -> DataFrame:
    """(id, component) member labels from the GROUP-reduced pair
    representation the dedup operators expose (`minhash_group_pairs`,
    `simhash_group_pairs`): cluster the group graph — nodes are
    distinct-value groups labeled by their min member id — and map
    members through their group.

    Exactly the label table `connected_components` would produce over
    the expanded member-pair graph: a member appears iff its group has
    ≥2 members (those expand to equal-value pairs) or ≥1 cross-group
    edge, and its component is the min member id reachable — which
    equals the min reachable gid, because every gid IS its group's min
    member id. The O(Σ clique²) expansion (the dominant pair mass on
    boilerplate-heavy corpora) never materializes: the label loop runs
    on |distinct values| nodes and cross-group edges only, and members
    are attached by ONE |corpus|-scale join at the end.

    ``mem`` must be (id, gid, gsz) with gid = min member id per group.
    """
    glab = connected_components(gpairs, src_col, dst_col).select(
        F.col("id").alias("gid"), F.col("component").alias("gcomp")
    )
    return (
        mem.join(glab, "gid", "left")
        .where((F.col("gsz") >= 2) | F.col("gcomp").isNotNull())
        .select("id", F.coalesce("gcomp", F.col("gid")).alias("component"))
    )


def canonical_docs_grouped(
    df: DataFrame, gpairs: DataFrame, mem: DataFrame, id_col: str,
) -> DataFrame:
    """`canonical_docs` over the group-reduced pair representation:
    keep the minimum-id document of every cluster, plus every document
    in no pair — byte-identical output, without expanding group pairs
    to member pairs.

    The drop set (cluster members that are not their component's
    representative) is eagerly localCheckpoint'd: it is at most
    node-scale (same as the label generations the clustering loop
    itself checkpoints), and pinning it lets the caller release the
    dedup operator's window-tag table immediately — the final action
    then scans ``df`` once against the pinned drop set instead of
    recomputing the signature subtree."""
    labels = grouped_labels(gpairs, mem)
    drop = (
        labels.where(F.col("id") != F.col("component"))
        .select(F.col("id").alias(id_col))
        .localCheckpoint()
    )
    return df.join(drop, id_col, "left_anti")


def canonical_docs(
    df: DataFrame, pairs: DataFrame, id_col: str,
    src_col: str = "id_a", dst_col: str = "id_b",
) -> DataFrame:
    """The deduplicated corpus under a near-dup PAIR relation: keep the
    minimum-id document of every connected cluster, plus every document
    that appears in no pair.

    One anti-join against the drop set (cluster members that are not
    their component's representative) — the drop set is |pairs|-scale,
    not corpus-scale, so the corpus passes through exactly once.
    """
    comp = connected_components(pairs, src_col, dst_col)
    drop = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")
