"""Bloom-shard prefilter tests (M5): exactness + FP behavior."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.bloom import BloomShards, optimal_k


def test_optimal_k():
    assert optimal_k(1 << 20, 100_000) >= 1
    assert optimal_k(1 << 20, 0) == 1
    assert optimal_k(8, 1 << 20) == 1  # clamped low


def test_numpy_membership_no_false_negatives():
    bf = BloomShards(n_shards=4, bits_per_shard=1 << 16, k=5)
    rng = np.random.default_rng(42)
    present = rng.integers(-(2**63), 2**63 - 1, size=2000, dtype=np.int64)
    bf.add_hashes(present)
    assert bf.might_contain_np(present).all(), "bloom must never false-negative"
    absent = rng.integers(-(2**63), 2**63 - 1, size=5000, dtype=np.int64)
    absent = np.setdiff1d(absent, present)
    fp = bf.might_contain_np(absent).mean()
    assert fp < 0.05, f"FP rate too high: {fp}"


def test_distributed_build_matches_driver_build(spark):
    urls = [f"http://h{i % 7}.test/p{i}" for i in range(3000)]
    df = spark.createDataFrame([(u,) for u in urls], ["url"]).withColumn(
        "url_hash", F.xxhash64("url")
    )
    bf = BloomShards.build(df, "url_hash", n_shards=4, bits_per_shard=1 << 16, k=5)
    hashes = np.array([r["url_hash"] for r in df.select("url_hash").collect()], dtype=np.int64)
    assert bf.might_contain_np(hashes).all()

    bf2 = BloomShards(4, 1 << 16, 5)
    bf2.add_hashes(hashes)
    for a, b in zip(bf.shards, bf2.shards):
        assert np.array_equal(a, b), "distributed build must equal serial OR"


def test_prefilter_preserves_exact_antijoin(spark):
    seen_urls = [f"http://a.test/{i}" for i in range(500)]
    new_urls = [f"http://a.test/{i}" for i in range(400, 900)]  # 100 overlap
    seen = spark.createDataFrame([(u,) for u in seen_urls], ["url"])
    links = spark.createDataFrame([(u,) for u in new_urls], ["url"])

    bf = BloomShards.build(
        seen.withColumn("url_hash", F.xxhash64("url")), "url_hash",
        n_shards=2, bits_per_shard=1 << 15, k=4,
    )
    got = sorted(r["url"] for r in bf.prefilter_fresh(links, seen).collect())
    want = sorted(r["url"] for r in links.join(seen, "url", "left_anti").collect())
    assert got == want, "prefilter must preserve exact anti-join semantics"


def test_incremental_add(spark):
    bf = BloomShards(2, 1 << 14, 4)
    h1 = np.arange(0, 100, dtype=np.int64) * 7919
    h2 = np.arange(100, 200, dtype=np.int64) * 7919
    bf.add_hashes(h1)
    assert bf.might_contain_np(h1).all()
    bf.add_hashes(h2)
    assert bf.might_contain_np(np.concatenate([h1, h2])).all()
