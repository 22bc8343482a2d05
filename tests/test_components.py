"""Connected components over near-dup pair graphs (operators/components).

Correctness oracle: a plain union-find over the same edge list, run
driver-side on the small fixtures. Also pins the O(log d) convergence
claim (a 300-node path must converge in ~2*log2(300) rounds, far fewer
than the 300 a propagate-only loop would need — asserted indirectly via
max_iter) and the canonical_docs keep-set semantics.
"""

import random

from pyspark.sql import functions as F

from crawler_spark.operators.components import canonical_docs, connected_components


def union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id representative per component
    return {x: find(x) for x in list(parent)}


def spark_components(spark, edges):
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    out = connected_components(df)
    return {r.id: r.component for r in out.collect()}


def test_path_graph_converges_logarithmically(spark):
    # a 300-node path has diameter 299: propagate-only needs 299
    # rounds; doubling must land well under max_iter=12 (2*log2(300)+C)
    edges = [(i, i + 1) for i in range(299)]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    out = connected_components(df, max_iter=12)
    rows = out.collect()
    assert len(rows) == 300
    assert all(r.component == 0 for r in rows)


def test_checkpoint_blocks_released_per_round(spark):
    """The label-propagation loop checkpoints |nodes|-scale labels every
    round; each round must RELEASE its predecessor's blocks (VERDICT r3
    #2) — otherwise an O(log d) loop leaves up to ~20 node-scale RDD
    generations persisted until a JVM GC. A 300-node path runs ~9-12
    rounds, so the persisted-RDD count after the call must sit within a
    small constant of the count before it (final labels + the persisted
    edge frame's bookkeeping), not grow per round."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    edges = [(i, i + 1) for i in range(299)]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    out = connected_components(df, max_iter=12)
    assert out.count() == 300
    after = jsc.getPersistentRDDs().size()
    # without per-round release this is before + n_rounds (~10+); with it
    # only the final labels checkpoint survives (plus nothing else: sym
    # is unpersisted on return)
    assert after - before <= 2, f"checkpoint leak: {before} -> {after} persisted RDDs"


def test_edge_partitioning_reused_by_propagate_join(spark):
    """The persisted edge table is hash(v)-partitioned ONCE at setup;
    every round's propagate join must consume that cached partitioning
    instead of re-shuffling the |E|-scale side. Pinned structurally:
    the (sym ⋈ labels on v → groupBy u) plan may contain exactly TWO
    hash exchanges — the labels side (to meet sym's partitioning) and
    the aggregation's u-exchange — never a third over the cache. Also
    pins that distinct() rode the setup repartition (an exchange-free
    dedup aggregate), i.e. the whole setup cost is one shuffle."""
    from crawler_spark.operators.components import _symmetrized_edges

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(500)], "id_a: long, id_b: long"
    )
    e = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    sym = _symmetrized_edges(e)
    try:
        # setup plan: repartition(v) then distinct — the dedup aggregate
        # must NOT add its own exchange (HashPartitioning(v) satisfies
        # the (u, v) clustering). The only exchange is the deliberate
        # REPARTITION_BY_COL; an optimizer-inserted one would be tagged
        # ENSURE_REQUIREMENTS.
        setup_plan = sym._jdf.queryExecution().executedPlan().toString()
        assert "REPARTITION_BY_COL" in setup_plan, setup_plan
        assert "ENSURE_REQUIREMENTS" not in setup_plan, setup_plan
        sym.count()  # materialize the cache
        labels = spark.range(1000).select(
            F.col("id").alias("v"), F.col("id").alias("vc")
        )
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            nbr_min = (
                sym.join(labels, "v").groupBy("u").agg(F.min("vc").alias("nc"))
            )
            plan = nbr_min._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        assert "InMemoryTableScan" in plan, plan
        # genuine re-shuffles carry the ENSURE_REQUIREMENTS tag; the
        # cached subtree's embedded plan copies only show the setup
        # REPARTITION_BY_COL. Exactly two: labels-side v, aggregate u —
        # a third would mean the cached edge partitioning was dropped
        # and the |E|-scale side re-shuffled.
        assert plan.count("ENSURE_REQUIREMENTS") == 2, plan
    finally:
        sym.unpersist()


def test_random_graph_matches_union_find(spark):
    rng = random.Random(1234)
    # 40 blocks of sparse edges -> many non-trivial components
    edges = []
    for blk in range(40):
        base = blk * 50
        for _ in range(30):
            a = base + rng.randrange(50)
            b = base + rng.randrange(50)
            edges.append((a, b))
    want = union_find([(a, b) for a, b in edges if a != b])
    got = spark_components(spark, edges)
    assert got == want
    # sanity: the fixture actually exercises multi-node, multi-component
    # structure
    assert len(set(want.values())) > 40


def test_self_loops_and_duplicates_ignored(spark):
    edges = [(1, 1), (2, 3), (3, 2), (2, 3), (7, 7)]
    got = spark_components(spark, edges)
    assert got == {2: 2, 3: 2}


def test_canonical_docs_keeps_one_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id: long, body: string"
    )
    # clusters {0,1,2} (transitive: 0-1, 1-2), {5,6}; 3,4,7,8,9 unpaired
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a: long, id_b: long"
    )
    kept = {
        r.doc_id
        for r in canonical_docs(docs, pairs, "doc_id").select("doc_id").collect()
    }
    assert kept == {0, 3, 4, 5, 7, 8, 9}


def test_composes_with_minhash_pairs(spark):
    # end-to-end: planted near-dup triple collapses to one kept doc even
    # though the far pair may never collide directly
    from crawler_spark.operators.dedup import minhash_near_dups

    base = "the quick brown fox jumps over the lazy dog " * 20
    rows = [
        (0, base),
        (1, base + " tail-a"),
        (2, base + " tail-a tail-b"),
        (3, "completely different content about spark engines " * 20),
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, body: string")
    pairs = minhash_near_dups(docs, "doc_id", "body", threshold=0.5)
    kept = {
        r.doc_id
        for r in canonical_docs(docs, pairs, "doc_id").select("doc_id").collect()
    }
    assert kept == {0, 3}


def test_grouped_labels_match_member_pair_components(spark):
    """grouped_labels over the group-reduced Hamming join must produce
    EXACTLY the label table connected_components builds from the fully
    expanded member-pair graph — same node set (members of ≥2-member
    hash groups, plus members of groups with a cross-hash edge) and
    same min-member-id labels — on a corpus mixing exact-dup cliques,
    cross-hash near pairs, a clique linked to a near neighbor, and
    untouched singletons."""
    from crawler_spark.operators.components import grouped_labels
    from crawler_spark.operators.dedup import (
        simhash_group_pairs, simhash_near_dups,
    )

    rows = []
    # clique A: 6 members share hash 0xABC0; id 100 also near 0xABC1
    for i in range(6):
        rows.append((100 + i, 0xABC0))
    rows.append((200, 0xABC1))            # hamming 1 from the clique
    # isolated near pair
    rows.append((300, 1 << 40))
    rows.append((301, (1 << 40) | 3))     # hamming 2
    # 2-member clique with no cross neighbors
    rows.append((400, 0x5555_0000))
    rows.append((401, 0x5555_0000))
    # singletons far from everything
    rows.append((500, -1))  # all-ones: ≥28 bits from every hash above
    rows.append((501, 0x0F0F_0F0F_0F0F_0F0))
    sh = spark.createDataFrame(rows, "id: long, simhash: long")

    member_pairs = simhash_near_dups(sh, radius=3)
    want = {
        r.id: r.component for r in connected_components(member_pairs).collect()
    }

    gpairs, mem, tagged = simhash_group_pairs(sh, radius=3)
    try:
        got = {r.id: r.component for r in grouped_labels(gpairs, mem).collect()}
    finally:
        tagged.unpersist()

    assert want  # fixture sanity: the member-pair path found clusters
    assert got == want
    assert 500 not in got and 501 not in got  # singletons stay out
    assert got[401] == 400                    # edge-less clique labeled by membership


def test_canonical_docs_grouped_equals_member_pair_canonical(spark):
    """canonical_docs_grouped(minhash_group_pairs) == canonical_docs(
    minhash_near_dups) keep set, including a doc too short to shingle
    (no signature → kept by both) and an exact-dup clique larger than
    max_bucket (the degenerate case the group representation exists
    for)."""
    from crawler_spark.operators.components import canonical_docs_grouped
    from crawler_spark.operators.dedup import (
        minhash_group_pairs, minhash_near_dups,
    )

    base = "the quick brown fox jumps over the lazy dog " * 20
    rows = [(i, base) for i in range(8)]                 # exact-dup clique
    rows += [(10, base + " tail-a"), (11, base + " tail-a tail-b")]
    rows += [(20, "completely different content about spark engines " * 20)]
    rows += [(30, "ab")]                                 # too short for 3-shingles
    docs = spark.createDataFrame(rows, "doc_id: long, body: string")
    kw = dict(threshold=0.5, max_bucket=2)               # clique >> cap

    pairs = minhash_near_dups(docs, "doc_id", "body", **kw)
    want = {
        r.doc_id
        for r in canonical_docs(docs, pairs, "doc_id").select("doc_id").collect()
    }

    gpairs, mem, tagged = minhash_group_pairs(docs, "doc_id", "body", **kw)
    try:
        kept = canonical_docs_grouped(docs, gpairs, mem, "doc_id")
        got = {r.doc_id for r in kept.select("doc_id").collect()}
    finally:
        tagged.unpersist()

    assert want == got
    assert 0 in got and 30 in got and 20 in got          # reps + unpaired survive
    assert not ({1, 2, 3, 4, 5, 6, 7} & got)             # clique non-reps dropped
