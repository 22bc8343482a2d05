"""Incremental phash dedup index == batch recompute, exactly.

The contract under test (operators/incremental.py): after ANY sequence
of `phash_index_update` batches, the index is row-identical to
`phash_index_build` over the union corpus, and `member_labels`
reproduces the batch `grouped_labels` table — same emitted member set,
same min-reachable-member-id components. Adversarial cases cover the
ways an incremental design silently diverges: delta edges that merge
two pre-existing components, out-of-order delta ids that must become
the new component minimum, equal-hash growth flipping the gsz≥2
emission rule, and no-op deltas that must change nothing.
"""

import random

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.components import grouped_labels
from crawler_spark.operators.dedup import simhash_group_pairs
from crawler_spark.operators.incremental import (
    member_labels,
    phash_index_build,
    phash_index_update,
)

RADIUS = 6


def _df(spark, rows):
    return spark.createDataFrame(rows, "image_id long, phash long")


def _index_rows(index):
    return sorted(
        (r.phash, r.gid, r.gsz, r.has_edge, r.comp)
        for r in index.collect()
    )


def _label_rows(df):
    return sorted((r.id, r.component) for r in df.collect())


def _fold(spark, batches):
    """build(batches[0]) then update() each remaining batch."""
    idx = phash_index_build(_df(spark, batches[0]), radius=RADIUS)
    for b in batches[1:]:
        idx = phash_index_update(idx, _df(spark, b), radius=RADIUS)
    return idx


def _batch_labels(spark, rows):
    """The existing batch operator the incremental face must match."""
    sh = _df(spark, rows).select(
        F.col("image_id").alias("id"), F.col("phash").alias("simhash")
    )
    gpairs, mem, tagged = simhash_group_pairs(sh, radius=RADIUS)
    try:
        out = _label_rows(grouped_labels(gpairs, mem))
    finally:
        tagged.unpersist()
    return out


def test_incremental_equals_batch_random(spark):
    """Randomized 3-batch fold == one-shot batch, for the full index
    AND the member-label face; ids arrive shuffled across batches so
    later batches carry smaller ids than earlier ones."""
    rng = random.Random(0xC0FFEE)
    seeds = [rng.getrandbits(64) - (1 << 63) for _ in range(40)]
    rows = []
    for i in range(600):
        h = seeds[rng.randrange(len(seeds))]
        # flip 0-8 random bits: some pairs land within radius, some out
        for _ in range(rng.randrange(9)):
            h ^= 1 << rng.randrange(64)
        rows.append((i, (h + (1 << 63)) % (1 << 64) - (1 << 63)))
    rng.shuffle(rows)
    batches = [rows[0:200], rows[200:401], rows[401:600]]

    idx = _fold(spark, batches)
    ref = phash_index_build(_df(spark, rows), radius=RADIUS)
    assert _index_rows(idx) == _index_rows(ref)

    inc_labels = _label_rows(member_labels(_df(spark, rows), idx))
    assert inc_labels == _label_rows(member_labels(_df(spark, rows), ref))
    assert inc_labels == _batch_labels(spark, rows)


def test_delta_bridge_merges_two_base_components(spark):
    """hamming(h0, h1) = 12 > radius: disconnected at build. The delta
    hash sits 6 bits from each — one new node must merge both base
    components into one label (the global min id)."""
    h0, h1, mid = 0, 0xFFF, 0x3F
    base = [(10, h0), (11, h1)]
    idx0 = phash_index_build(_df(spark, base), radius=RADIUS)
    # disconnected singletons: nothing emitted (gsz 1, no edge)
    assert _label_rows(member_labels(_df(spark, base), idx0)) == []

    idx1 = phash_index_update(idx0, _df(spark, [(12, mid)]), radius=RADIUS)
    everything = base + [(12, mid)]
    got = _label_rows(member_labels(_df(spark, everything), idx1))
    assert got == [(10, 10), (11, 10), (12, 10)]
    assert _index_rows(idx1) == _index_rows(
        phash_index_build(_df(spark, everything), radius=RADIUS)
    )


def test_out_of_order_delta_id_becomes_component_min(spark):
    """A delta member with a SMALLER id than the existing component
    minimum must relabel the whole component, including base hashes the
    delta never touches directly."""
    base = [(10, 0), (11, 1)]  # hamming 1: one component labeled 10
    idx0 = phash_index_build(_df(spark, base), radius=RADIUS)
    idx1 = phash_index_update(idx0, _df(spark, [(5, 0)]), radius=RADIUS)
    everything = base + [(5, 0)]
    got = _label_rows(member_labels(_df(spark, everything), idx1))
    assert got == [(5, 5), (10, 5), (11, 5)]
    assert _index_rows(idx1) == _index_rows(
        phash_index_build(_df(spark, everything), radius=RADIUS)
    )


def test_equal_hash_growth_flips_emission(spark):
    """A singleton hash (gsz 1, no edge → not emitted) gains an
    equal-hash twin: both copies must now appear, comp = min id."""
    far = 0x5555555555555555  # hamming 31 from hash 7: genuinely far
    base = [(3, 7), (4, far)]
    idx0 = phash_index_build(_df(spark, base), radius=RADIUS)
    assert _label_rows(member_labels(_df(spark, base), idx0)) == []

    idx1 = phash_index_update(idx0, _df(spark, [(9, 7)]), radius=RADIUS)
    everything = base + [(9, 7)]
    got = _label_rows(member_labels(_df(spark, everything), idx1))
    assert got == [(3, 3), (9, 3)]


def test_noop_delta_changes_nothing(spark):
    """A delta hash far from every indexed hash adds one inert index
    row and leaves every existing row byte-identical."""
    base = [(1, 0), (2, 1)]
    idx0 = phash_index_build(_df(spark, base), radius=RADIUS)
    before = _index_rows(idx0)
    far = 0x5555555555555555  # hamming ≥30 from hashes 0 and 1
    idx1 = phash_index_update(idx0, _df(spark, [(50, far)]), radius=RADIUS)
    after = _index_rows(idx1)
    assert [r for r in after if r[0] != far] == before
    assert (far, 50, 1, False, 50) in after


def test_update_cost_is_delta_scale(spark):
    """The contracted graph and touched-base probe must not grow with
    the corpus: a delta far from most of a 2000-hash base touches only
    its own pigeonhole buckets' occupants."""
    # base hashes spread by large strides: sparse bucket occupancy
    base = [(i, (i * 0x9E3779B97F4A7C15) % (1 << 63)) for i in range(2000)]
    idx0 = phash_index_build(_df(spark, base), radius=RADIUS)
    stats = {}
    idx1 = phash_index_update(
        idx0, _df(spark, [(5000, 123), (5001, 124)]), radius=RADIUS, stats=stats
    )
    assert stats["n_delta_hashes"] == 2
    # pigeonhole touch-set ≪ index size (2000); generous skew allowance
    assert stats["n_touched_base"] < 200
    assert idx1.count() == 2002


def test_index_is_never_shuffle_joined(spark):
    """The scale contract: the corpus-scale index participates in the
    update via broadcast joins only — ONE map-side pass, no shuffle.
    With auto-broadcast disabled, every index-side equi-join must still
    plan as BroadcastHashJoin (from the explicit hints); a
    SortMergeJoin or ShuffledHashJoin over the index would mean the
    10^10-row side gets exchanged every batch."""
    base = [(i, (i * 0x9E3779B97F4A7C15) % (1 << 63)) for i in range(500)]
    idx0 = phash_index_build(_df(spark, base), radius=RADIUS)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    plans: dict = {}
    try:
        phash_index_update(
            idx0, _df(spark, [(900, 123), (901, 123)]), radius=RADIUS,
            plans=plans,
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    plan = plans["existing"]
    # the tree prints each join BEFORE its children and the index scan
    # is the left (first) child of the innermost join, so the text
    # above the "Scan ExistingRDD" line is exactly the spine of joins
    # that consume the index. Delta-scale self-joins inside embedded
    # cached subtrees (below the scan line) may legitimately sort-merge.
    spine = plan[: plan.index("Scan ExistingRDD")]
    assert "SortMergeJoin" not in spine, spine
    assert "ShuffledHashJoin" not in spine, spine
    assert "Exchange hashpartitioning" not in spine, spine
    assert spine.count("BroadcastHashJoin") == 3, spine


def test_three_batch_chain_with_merges(spark):
    """Chained updates where every batch both extends old components
    and creates new ones; final state == batch, labels == batch."""
    rng = random.Random(7)
    clusters = [rng.getrandbits(64) - (1 << 63) for _ in range(6)]
    rows = []
    for i in range(120):
        h = clusters[i % len(clusters)] ^ (1 << (i % 5))
        rows.append((1000 - i, h))  # decreasing ids: every batch lowers mins
    batches = [rows[:40], rows[40:80], rows[80:]]
    idx = _fold(spark, batches)
    assert _index_rows(idx) == _index_rows(
        phash_index_build(_df(spark, rows), radius=RADIUS)
    )
    assert _label_rows(member_labels(_df(spark, rows), idx)) == _batch_labels(
        spark, rows
    )


def _random_rows(seed, n=400, n_seeds=30):
    rng = random.Random(seed)
    seeds = [rng.getrandbits(64) - (1 << 63) for _ in range(n_seeds)]
    rows = []
    for i in range(n):
        h = seeds[rng.randrange(len(seeds))]
        for _ in range(rng.randrange(9)):
            h ^= 1 << rng.randrange(64)
        rows.append((i, (h + (1 << 63)) % (1 << 64) - (1 << 63)))
    rng.shuffle(rows)
    return rows


def test_lsm_equals_dense_chain(spark):
    """The LSM face (changed-rows frames, latest-wins) must resolve to
    the SAME index as the dense update chain and the one-shot build,
    through a 4-batch fold with a mid-chain compaction."""
    from crawler_spark.operators.incremental import LSMPhashIndex

    rows = _random_rows(0xBEEF)
    batches = [rows[:100], rows[100:200], rows[200:300], rows[300:]]

    dense = _fold(spark, batches)

    lsm = LSMPhashIndex.build(_df(spark, batches[0]), radius=RADIUS)
    for i, b in enumerate(batches[1:]):
        lsm = lsm.update(_df(spark, b))
        if i == 1:
            lsm = lsm.compact()
            assert lsm.frames == []
    assert _index_rows(lsm.resolved()) == _index_rows(dense)
    assert _label_rows(member_labels(_df(spark, rows), lsm.resolved())) == (
        _batch_labels(spark, rows)
    )


def test_lsm_frame_is_changed_scale(spark):
    """A frame materializes only what the fold changed: for a tiny
    delta against a 2000-hash base, frame rows stay delta-bounded while
    the dense path would rewrite all 2000."""
    from crawler_spark.operators.incremental import LSMPhashIndex

    # i from 1: i=0 would plant phash 0, which is hamming-6 from 123
    base = [(i, (i * 0x9E3779B97F4A7C15) % (1 << 63)) for i in range(1, 2000)]
    lsm = LSMPhashIndex.build(_df(spark, base), radius=RADIUS)
    stats: dict = {}
    lsm2 = lsm.update(_df(spark, [(5000, 123), (5001, 123)]), stats=stats)
    assert stats["frame_rows"] <= 10, stats
    assert lsm2.resolved().count() == 2000
    got = _label_rows(member_labels(
        _df(spark, base + [(5000, 123), (5001, 123)]), lsm2.resolved()
    ))
    assert got == [(5000, 5000), (5001, 5000)]


def test_lsm_edge_flip_without_comp_change(spark):
    """A delta hash pairs with a base hash that is ALREADY its
    component's min: comp doesn't move, but has_edge must flip and the
    base member must start being emitted — the changed-set must include
    new-edge hashes, not just remapped components."""
    from crawler_spark.operators.incremental import LSMPhashIndex

    far = 0x5555555555555555
    base = [(3, 7), (4, far)]
    lsm = LSMPhashIndex.build(_df(spark, base), radius=RADIUS)
    lsm2 = lsm.update(_df(spark, [(9, 7 ^ 1)]))
    everything = base + [(9, 7 ^ 1)]
    got = _label_rows(member_labels(_df(spark, everything), lsm2.resolved()))
    assert got == [(3, 3), (9, 3)]
    assert _index_rows(lsm2.resolved()) == _index_rows(
        phash_index_build(_df(spark, everything), radius=RADIUS)
    )


def test_lsm_merge_across_frames(spark):
    """A later frame must shadow an earlier one: batch 2 bridges two
    components created across base + frame 1, and the stale frame-1
    comp rows lose to the merged relabel under latest-wins."""
    from crawler_spark.operators.incremental import LSMPhashIndex

    h0, h1, mid = 0, 0xFFF, 0x3F
    lsm = LSMPhashIndex.build(_df(spark, [(10, h0), (11, h0)]), radius=RADIUS)
    lsm = lsm.update(_df(spark, [(12, h1), (13, h1)]))
    lsm = lsm.update(_df(spark, [(14, mid)]))  # bridges h0↔mid↔h1
    everything = [(10, h0), (11, h0), (12, h1), (13, h1), (14, mid)]
    got = _label_rows(member_labels(_df(spark, everything), lsm.resolved()))
    assert got == [(10, 10), (11, 10), (12, 10), (13, 10), (14, 10)]
    assert _index_rows(lsm.resolved()) == _index_rows(
        phash_index_build(_df(spark, everything), radius=RADIUS)
    )


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))


def test_small_cc_gate_crossover_identical(spark):
    """The size-gated small-graph strategy (components_auto: driver
    union-find under the edge gate, distributed label propagation over
    it) must be invisible: build+fold with the gate forced OFF
    (small_cc_max=0 → every graph takes the distributed loop) and with
    it forced ON (huge gate → driver union-find everywhere) and compare
    the resolved index row-for-row. Also pins components_auto directly
    on a random pair graph across both routes."""
    from crawler_spark.operators.components import (
        components_auto,
        connected_components,
    )

    rows = _random_rows(31)
    base, delta = rows[: len(rows) // 2], rows[len(rows) // 2:]
    out = {}
    for tag, gate in {"dist": 0, "driver": 1 << 30}.items():
        idx = phash_index_build(
            _df(spark, base), radius=RADIUS, small_cc_max=gate
        )
        idx = phash_index_update(
            idx, _df(spark, delta), radius=RADIUS, small_cc_max=gate
        )
        out[tag] = _index_rows(idx)
    assert out["dist"] == out["driver"]

    rng = random.Random(7)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(120)]
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    a = _label_rows(components_auto(pdf, small_max=0))
    b = _label_rows(components_auto(pdf, small_max=10_000))
    c = _label_rows(connected_components(pdf))
    assert a == b == c
