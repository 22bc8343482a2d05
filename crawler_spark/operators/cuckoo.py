"""Sharded cuckoo-filter URL-seen prefilter — the deletable alternative
to operators/bloom (the north rule names "bloom/cuckoo-filter URL-seen
membership"; the reference itself ships bloom only, bloom/bloom.go).

Same contract as BloomShards: ``might_contain == False`` PROVES a URL
is fresh (no false negatives, ever — an insert that cannot place after
the eviction bound parks its entry in a tiny per-shard overflow list
that probes check too); positives still go through the exact anti-join.
What cuckoo adds over bloom:

  * **deletion** (bloom cannot delete): a URL evicted from the exact
    seen set — e.g. cache eviction or a site-removal request — can be
    removed from the filter without a full rebuild;
  * ~same space at equal FP (16-bit fingerprints, 4-way buckets,
    ~95% load), with two-bucket locality instead of k probes.

Distributed build mirrors BloomShards.build: one applyInPandas per
shard; insertion is vectorized in waves (first-occurrence-per-bucket
placement via np.unique, 4 slots × 2 buckets) with a bounded per-row
kick loop only for the tail that wave placement misses. The driver only
ever receives finished tables.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

SLOTS = 4
MAX_KICKS = 500
_FP_MIX = np.uint64(0x5BD1E995)


def _fp_and_buckets(h: np.ndarray, n_buckets: int):
    """fingerprint (16-bit, never 0) + the two candidate buckets.
    i2 = i1 XOR hash(fp) — the partial-key cuckoo construction, so a
    stored (bucket, fp) pair recovers its alternate bucket."""
    hu = np.asarray(h, dtype=np.int64).view(np.uint64)
    fp = ((hu >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp = np.where(fp == 0, np.uint16(1), fp)
    nb = np.uint64(n_buckets)
    i1 = ((hu >> np.uint64(16)) % nb).astype(np.int64)
    alt = ((fp.astype(np.uint64) * _FP_MIX) % nb).astype(np.int64)
    i2 = np.bitwise_xor(i1, alt) % np.int64(n_buckets)
    return fp, i1, i2


def _alt_bucket(bucket: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    alt = ((fp.astype(np.uint64) * _FP_MIX) % np.uint64(n_buckets)).astype(np.int64)
    return np.bitwise_xor(bucket, alt) % np.int64(n_buckets)


def _insert_into(table: np.ndarray, overflow: list, fp: np.ndarray, i1: np.ndarray, i2: np.ndarray) -> None:
    """Insert (fp, i1, i2) triples into a (n_buckets, SLOTS) uint16 table.
    Wave placement first (vectorized), bounded kick loop for the tail."""
    n_buckets = table.shape[0]
    pend_fp, pend_b1, pend_b2 = fp, i1, i2
    for bsel in range(2):
        bk = pend_b1 if bsel == 0 else pend_b2
        for s in range(SLOTS):
            if len(pend_fp) == 0:
                return
            free = table[bk, s] == 0
            cand = np.nonzero(free)[0]
            if len(cand) == 0:
                continue
            # first pending row per free bucket wins this wave
            _, first = np.unique(bk[cand], return_index=True)
            take = cand[first]
            table[bk[take], s] = pend_fp[take]
            keep = np.ones(len(pend_fp), dtype=bool)
            keep[take] = False
            pend_fp, pend_b1, pend_b2 = pend_fp[keep], pend_b1[keep], pend_b2[keep]
            bk = pend_b1 if bsel == 0 else pend_b2
    # tail: classic random-walk eviction, deterministic kick choice
    for f, b1 in zip(pend_fp, pend_b1):
        cur_fp, cur_b = np.uint16(f), int(b1)
        placed = False
        for kick in range(MAX_KICKS):
            row = table[cur_b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                table[cur_b, empty[0]] = cur_fp
                placed = True
                break
            victim_slot = (int(cur_fp) + kick) % SLOTS
            victim = row[victim_slot]
            table[cur_b, victim_slot] = cur_fp
            cur_fp = victim
            cur_b = int(_alt_bucket(np.array([cur_b]), np.array([cur_fp], dtype=np.uint16), table.shape[0])[0])
        if not placed:
            overflow.append((int(cur_b) << 16) | int(cur_fp))


class CuckooShards:
    """n_shards independent cuckoo tables over 64-bit url hashes."""

    def __init__(self, n_shards: int, buckets_per_shard: int):
        # The partial-key construction (i2 = i1 XOR hash(fp)) is only an
        # involution when n_buckets is a power of two: with pow2 buckets
        # XOR of two in-range values stays in range, so a kicked entry's
        # alternate bucket is exactly the bucket probes check. A non-pow2
        # count lets kicked entries land where neither probe looks — a
        # false NEGATIVE, violating the "fresh is proven" contract. Round
        # up unconditionally (build() already sizes pow2; this guards the
        # direct-constructor path the engine uses).
        buckets_per_shard = max(16, buckets_per_shard)
        if buckets_per_shard & (buckets_per_shard - 1):
            buckets_per_shard = 1 << buckets_per_shard.bit_length()
        self.n_shards = n_shards
        self.n_buckets = buckets_per_shard
        self.tables = [
            np.zeros((buckets_per_shard, SLOTS), dtype=np.uint16) for _ in range(n_shards)
        ]
        self.overflow: list[list[int]] = [[] for _ in range(n_shards)]
        self._bc = None

    # ---------------------------------------------------------------- #
    def add_hashes(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        shard_of = (h % np.uint64(self.n_shards)).astype(np.int64)
        for s in range(self.n_shards):
            hs = h[shard_of == s]
            if len(hs) == 0:
                continue
            fp, i1, i2 = _fp_and_buckets(hs.view(np.int64), self.n_buckets)
            _insert_into(self.tables[s], self.overflow[s], fp, i1, i2)
        self._bc = None

    def delete_hashes(self, hashes: np.ndarray) -> int:
        """Remove one stored copy per present hash (the cuckoo advantage
        over bloom). Returns how many were found+removed.

        Standard cuckoo caveat: deletes are only safe for hashes that
        were PREVIOUSLY INSERTED. Deleting a never-inserted hash whose
        fingerprint aliases a stored entry in either candidate bucket
        evicts that other entry, creating a false negative for its URL.
        The engine therefore only wires deletes for hashes it verified
        against the exact seen set (cache eviction / site removal), never
        for speculative ones."""
        removed = 0
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        shard_of = (h % np.uint64(self.n_shards)).astype(np.int64)
        for s in range(self.n_shards):
            hs = h[shard_of == s]
            if len(hs) == 0:
                continue
            fp, i1, i2 = _fp_and_buckets(hs.view(np.int64), self.n_buckets)
            t = self.tables[s]
            for f, b1, b2 in zip(fp, i1, i2):
                done = False
                for b in (b1, b2):
                    sl = np.nonzero(t[b] == f)[0]
                    if len(sl):
                        t[b, sl[0]] = 0
                        removed += 1
                        done = True
                        break
                if not done:
                    key = None
                    for b in (b1, b2):
                        k = (int(b) << 16) | int(f)
                        if k in self.overflow[s]:
                            key = k
                            break
                    if key is not None:
                        self.overflow[s].remove(key)
                        removed += 1
        self._bc = None
        return removed

    def might_contain_np(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        shard_of = (h % np.uint64(self.n_shards)).astype(np.int64)
        out = np.zeros(len(h), dtype=bool)
        for s in range(self.n_shards):
            mask = shard_of == s
            if not mask.any():
                continue
            hs = h[mask]
            fp, i1, i2 = _fp_and_buckets(hs.view(np.int64), self.n_buckets)
            t = self.tables[s]
            hit = (t[i1] == fp[:, None]).any(axis=1) | (t[i2] == fp[:, None]).any(axis=1)
            if self.overflow[s]:
                ov = np.asarray(self.overflow[s], dtype=np.int64)
                k1 = (i1 << 16) | fp.astype(np.int64)
                k2 = (i2 << 16) | fp.astype(np.int64)
                hit |= np.isin(k1, ov) | np.isin(k2, ov)
            out[mask] = hit
        return out

    # ---------------------------------------------------------------- #
    @classmethod
    def build(
        cls,
        seen: DataFrame,
        hash_col: str = "url_hash",
        *,
        n_shards: int = 8,
        buckets_per_shard: Optional[int] = None,
        expected_n: Optional[int] = None,
    ) -> "CuckooShards":
        """Distributed build: one applyInPandas per shard builds the
        table executor-side; the driver receives finished tables only.
        Sized for ≤~90% load: buckets = next_pow2(n/(shards·SLOTS)/0.9)."""
        if buckets_per_shard is None:
            n = max(expected_n or 1_000_000, 1)
            need = int(n / n_shards / SLOTS / 0.9) + 1
            buckets_per_shard = 1 << max(4, (need - 1).bit_length())
        cf = cls(n_shards, buckets_per_shard)
        nb, ns = cf.n_buckets, n_shards  # constructor may round up to pow2

        def per_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            h = pdf["h"].to_numpy(dtype=np.int64)
            table = np.zeros((nb, SLOTS), dtype=np.uint16)
            overflow: list[int] = []
            fp, i1, i2 = _fp_and_buckets(h, nb)
            _insert_into(table, overflow, fp, i1, i2)
            return pd.DataFrame(
                {
                    "shard": [int(pdf["shard"].iloc[0])],
                    "table": [table.tobytes()],
                    "overflow": [np.asarray(overflow, dtype=np.int64).tobytes()],
                }
            )

        rows = (
            seen.select(F.col(hash_col).alias("h"))
            .withColumn("shard", F.pmod(F.col("h"), F.lit(ns)).cast("int"))
            .groupBy("shard")
            .applyInPandas(per_shard, "shard int, table binary, overflow binary")
            .collect()
        )
        for r in rows:
            cf.tables[r["shard"]] = (
                np.frombuffer(r["table"], dtype=np.uint16).reshape(nb, SLOTS).copy()
            )
            cf.overflow[r["shard"]] = list(np.frombuffer(r["overflow"], dtype=np.int64))
        return cf

    # ---------------------------------------------------------------- #
    def might_contain_udf(self, spark: SparkSession):
        if self._bc is None:
            self._bc = spark.sparkContext.broadcast(
                {
                    "tables": [t.tobytes() for t in self.tables],
                    "overflow": self.overflow,
                    "nb": self.n_buckets,
                    "n": self.n_shards,
                }
            )
        bc = self._bc

        @F.pandas_udf(BooleanType())
        def _mc(hashes: pd.Series) -> pd.Series:
            st = bc.value
            cf = CuckooShards(st["n"], st["nb"])
            cf.tables = [
                np.frombuffer(b, dtype=np.uint16).reshape(st["nb"], SLOTS)
                for b in st["tables"]
            ]
            cf.overflow = st["overflow"]
            return pd.Series(cf.might_contain_np(hashes.to_numpy(dtype=np.int64)))

        return _mc

    def release(self) -> None:
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
        """Identical contract to BloomShards.prefilter_fresh (M5 — the
        filter never rejects alone); duck-typed so CrawlEngine can swap
        the filter implementation without touching the step plan."""
        from crawler_spark.operators.bloom import BloomShards

        return BloomShards.prefilter_fresh(
            self, links, seen, url_col, recent_min_seq=recent_min_seq,
            seq_col=seq_col, broadcast_recent=broadcast_recent,
        )
