"""Sharded Bloom-filter URL-seen prefilter (M5).

The reference keeps a scalable bloom filter in front of (or instead of)
its exact store: bloom/bloom.go:25-76; boltstore answers ``Exist`` from
the bloom alone (storage/boltstore/store.go:111-120, FP 1e-4), which can
*drop* URLs on false positives. The north rule demands the exact seen
set, so here the bloom is strictly a prefilter: ``might_contain == False``
proves a URL is fresh and skips the anti-join probe; positives still go
through the exact anti-join. False positives cost work, never
correctness.

Design for 10^10 URLs:
  * the seen set is sharded by ``shard = url_hash % n_shards``; each
    shard is an independent bitmap built with a distributive
    sum-of-bitmaps aggregation (map-side partial ORs via numpy inside
    one applyInPandas per shard — Arrow-batched, no per-row Python).
  * shards are numpy bitmaps broadcast to executors (``sc.broadcast``);
    membership tests run vectorized inside a pandas UDF.
  * incremental maintenance is LSM-style: the broadcast bloom covers the
    ``seen`` prefix up to a seq watermark (the last distributed rebuild);
    URLs added since then live in a small *recent* slice that
    bloom-negative rows anti-join (broadcast). No per-step driver
    collect or re-broadcast ever happens on the step path; a periodic
    ``build()`` (rebuild cadence = rows-since-rebuild threshold) folds
    the recent slice in. ``add_hashes`` remains for driver-side unit use.
  * k hash probes derive from the single 64-bit xxhash64 url_hash by
    double hashing (h1 + i*h2), the standard Kirsch-Mitzenmacher
    construction — no re-hashing of the URL string.

Sizing: bits_per_shard=2^27 (16 MiB) × 64 shards ≈ 1 GiB of driver /
broadcast memory for ~10^9 seen URLs at ~1% FP; at 10^10, shards climb
to 512 (driver holds one at a time during rebuild; executors hold the
broadcast read-only pages, shared across tasks).
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


def optimal_k(bits: int, n: int) -> int:
    if n <= 0:
        return 1
    return max(1, min(16, round(bits / n * math.log(2))))


class BloomShards:
    """n_shards independent bloom bitmaps over 64-bit url hashes."""

    def __init__(self, n_shards: int, bits_per_shard: int, k: int):
        assert bits_per_shard % 8 == 0
        self.n_shards = n_shards
        self.bits = bits_per_shard
        self.k = k
        self.shards = [np.zeros(bits_per_shard // 8, dtype=np.uint8) for _ in range(n_shards)]
        self._bc = None

    # ---------------------------------------------------------------- #
    def _probe_positions(self, hashes: np.ndarray) -> Iterator[np.ndarray]:
        """Kirsch-Mitzenmacher double hashing from one 64-bit hash."""
        h = hashes.astype(np.uint64)
        h1 = h & np.uint64(0xFFFFFFFF)
        h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd ⇒ full-period stride
        for i in range(self.k):
            yield ((h1 + np.uint64(i) * h2) % np.uint64(self.bits)).astype(np.int64)

    def add_hashes(self, hashes: np.ndarray) -> None:
        """OR a batch of url hashes into the shard bitmaps (driver side
        for small deltas; rebuild() for bulk)."""
        if len(hashes) == 0:
            return
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        shard_of = (h % np.uint64(self.n_shards)).astype(np.int64)
        for s in range(self.n_shards):
            hs = h[shard_of == s]
            if len(hs) == 0:
                continue
            bm = self.shards[s]
            for pos in self._probe_positions(hs):
                np.bitwise_or.at(bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        self._bc = None  # invalidate broadcast

    def might_contain_np(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        shard_of = (h % np.uint64(self.n_shards)).astype(np.int64)
        out = np.ones(len(h), dtype=bool)
        for s in range(self.n_shards):
            mask = shard_of == s
            if not mask.any():
                continue
            hs = h[mask]
            bm = self.shards[s]
            ok = np.ones(len(hs), dtype=bool)
            for pos in self._probe_positions(hs):
                ok &= (bm[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
            out[mask] = ok
        return out

    # ---------------------------------------------------------------- #
    @classmethod
    def build(
        cls,
        seen: DataFrame,
        hash_col: str = "url_hash",
        *,
        n_shards: int = 8,
        bits_per_shard: int = 1 << 22,
        k: Optional[int] = None,
        expected_n: Optional[int] = None,
    ) -> "BloomShards":
        """Distributed build: one applyInPandas pass ORs per-partition
        bitmaps per shard; the driver only ever holds finished bitmaps."""
        if k is None:
            k = optimal_k(bits_per_shard, (expected_n or 1_000_000) // n_shards)
        bf = cls(n_shards, bits_per_shard, k)

        bits, kk, ns = bits_per_shard, k, n_shards

        def per_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            h = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
            bm = np.zeros(bits // 8, dtype=np.uint8)
            h1 = h & np.uint64(0xFFFFFFFF)
            h2 = (h >> np.uint64(32)) | np.uint64(1)
            for i in range(kk):
                pos = ((h1 + np.uint64(i) * h2) % np.uint64(bits)).astype(np.int64)
                np.bitwise_or.at(bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
            return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])], "bitmap": [bm.tobytes()]})

        rows = (
            seen.select(F.col(hash_col).alias("h"))
            .withColumn("shard", F.pmod(F.col("h"), F.lit(ns)).cast("int"))
            .groupBy("shard")
            .applyInPandas(per_shard, "shard int, bitmap binary")
            .collect()
        )
        for r in rows:
            bf.shards[r["shard"]] = np.frombuffer(r["bitmap"], dtype=np.uint8).copy()
        return bf

    # ---------------------------------------------------------------- #
    def might_contain_udf(self, spark: SparkSession):
        """Vectorized membership test; shards ship via sc.broadcast so
        executors share one read-only copy per node."""
        if self._bc is None:
            self._bc = spark.sparkContext.broadcast(
                {"shards": [s.tobytes() for s in self.shards], "bits": self.bits,
                 "k": self.k, "n": self.n_shards}
            )
        bc = self._bc

        @F.pandas_udf(BooleanType())
        def _mc(hashes: pd.Series) -> pd.Series:
            st = bc.value
            bf = BloomShards(st["n"], st["bits"], st["k"])
            bf.shards = [np.frombuffer(b, dtype=np.uint8) for b in st["shards"]]
            return pd.Series(bf.might_contain_np(hashes.to_numpy(dtype=np.int64)))

        return _mc

    def release(self) -> None:
        """Unpersist the executor-side broadcast (called when a rebuild
        replaces this generation of shards)."""
        if self._bc is not None:
            try:
                self._bc.unpersist(False)
            except Exception:
                pass
            self._bc = None

    def prefilter_fresh(
        self,
        links: DataFrame,
        seen: DataFrame,
        url_col: str = "url",
        *,
        recent_min_seq: Optional[int] = None,
        seq_col: str = "seq",
        broadcast_recent: bool = True,
    ) -> DataFrame:
        """Exact anti-join with the bloom prefilter in front.

        definitely-fresh (bloom negative) rows skip the shuffle probe;
        possible-seen rows go through the exact anti-join — the split
        preserves exact semantics (M5: bloom never rejects alone).

        LSM-style staleness handling (``recent_min_seq``): the bloom may
        cover only the prefix of ``seen`` with ``seq < recent_min_seq``
        (the state as of the last distributed rebuild). Bloom-negative
        rows are then proven absent from that prefix but must still
        anti-join the small *recent* slice (``seq >= recent_min_seq``,
        bounded by the rebuild cadence ⇒ broadcastable). This keeps the
        step path free of driver-side filter maintenance: no per-step
        collect, no per-step re-broadcast — only a periodic distributed
        ``build()`` (the incremental-maintenance answer for 10^10 URLs).
        """
        spark = links.sparkSession
        mc = self.might_contain_udf(spark)
        tagged = links.withColumn("_maybe_seen", mc(F.xxhash64(F.col(url_col))))
        fresh_fast = tagged.where(~F.col("_maybe_seen")).drop("_maybe_seen")
        if recent_min_seq is not None:
            # the caller knows the slice's row bound (rebuild/compaction
            # cadence) — broadcast only while it is broadcast-sized, else
            # let the planner shuffle it (LSM engines with large
            # compaction windows pass broadcast_recent=False)
            recent = seen.where(F.col(seq_col) >= F.lit(recent_min_seq)).select(url_col)
            if broadcast_recent:
                recent = F.broadcast(recent)
            fresh_fast = fresh_fast.join(recent, url_col, "left_anti")
        probed = (
            tagged.where(F.col("_maybe_seen"))
            .drop("_maybe_seen")
            .join(seen.select(url_col), url_col, "left_anti")
        )
        return fresh_fast.unionByName(probed)
