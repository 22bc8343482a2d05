"""Cuckoo-filter URL-seen prefilter: no false negatives ever, bounded
false positives, deletion, distributed build, and prefilter parity with
the bloom contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.cuckoo import CuckooShards


def _hashes(seed, n):
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64)


def test_no_false_negatives_and_fp_bound():
    cf = CuckooShards(n_shards=4, buckets_per_shard=1 << 12)  # 65536 slots
    ins = _hashes(1, 40_000)  # ~61% load
    cf.add_hashes(ins)
    assert cf.might_contain_np(ins).all()  # NEVER a false negative
    other = _hashes(2, 40_000)
    other = other[~np.isin(other, ins)]
    fp_rate = cf.might_contain_np(other).mean()
    # 16-bit fp, 2 buckets x 4 slots: theoretical ~ 8*load/2^16 ~ 7e-5
    assert fp_rate < 0.005, fp_rate


def test_high_load_overflow_still_exact():
    # overfill a tiny filter: inserts beyond capacity land in overflow,
    # membership still has zero false negatives
    cf = CuckooShards(n_shards=1, buckets_per_shard=16)  # 64 slots
    ins = _hashes(3, 100)
    cf.add_hashes(ins)
    assert cf.might_contain_np(ins).all()
    assert sum(len(o) for o in cf.overflow) > 0  # it DID overflow


def test_non_pow2_buckets_rounded_up_no_false_negatives():
    """Regression: partial-key cuckoo (i2 = i1 XOR hash(fp)) is only an
    involution for pow2 bucket counts; a 48-bucket filter used to lose
    kicked entries to buckets neither probe checks (~2/170 false
    negatives). The constructor now rounds up to the next power of two."""
    cf = CuckooShards(n_shards=1, buckets_per_shard=48)
    assert cf.n_buckets == 64  # rounded up, pow2
    ins = _hashes(7, 170)  # the load that reproduced the false negatives
    cf.add_hashes(ins)
    assert cf.might_contain_np(ins).all()  # NEVER a false negative
    # heavier sweep across several non-pow2 requests
    for req, n in ((100, 300), (1000, 3000), (3333, 9000)):
        cf = CuckooShards(n_shards=2, buckets_per_shard=req)
        assert cf.n_buckets & (cf.n_buckets - 1) == 0
        ins = _hashes(req, n)
        cf.add_hashes(ins)
        assert cf.might_contain_np(ins).all()


def test_delete():
    cf = CuckooShards(n_shards=2, buckets_per_shard=1 << 10)
    ins = _hashes(4, 2_000)
    cf.add_hashes(ins)
    gone = ins[:500]
    assert cf.delete_hashes(gone) == 500
    assert cf.might_contain_np(ins[500:]).all()  # survivors intact
    # deleted entries are (almost all) negative now; identical
    # fingerprints from other survivors may alias a few
    assert cf.might_contain_np(gone).mean() < 0.05


def test_distributed_build_matches_driver_build(spark):
    h = _hashes(5, 30_000)
    df = spark.createDataFrame([(int(x),) for x in h], "url_hash long")
    cf = CuckooShards.build(df, n_shards=4, expected_n=30_000)
    assert cf.might_contain_np(h).all()
    other = _hashes(6, 20_000)
    other = other[~np.isin(other, h)]
    assert cf.might_contain_np(other).mean() < 0.005


def test_prefilter_fresh_exact_set(spark):
    seen_urls = [(f"http://h{i % 7}.test/p{i}", i) for i in range(3_000)]
    seen = spark.createDataFrame(seen_urls, "url string, seq long")
    cf = CuckooShards.build(
        seen.select(F.xxhash64("url").alias("url_hash")), expected_n=3_000
    )
    links = spark.createDataFrame(
        [(f"http://h{i % 7}.test/p{i}",) for i in range(2_000, 5_000)], "url string"
    )
    got = {r["url"] for r in cf.prefilter_fresh(links, seen).collect()}
    want = {f"http://h{i % 7}.test/p{i}" for i in range(3_000, 5_000)}
    assert got == want  # exact freshness despite the approximate filter
    cf.release()
