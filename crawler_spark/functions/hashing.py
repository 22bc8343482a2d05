"""64-bit URL identity + fingerprint hashing, all JVM-side where possible.

The reference keys its stores on the full normalized URL string
(store.go:56,94) and blooms over its bytes (bloom/bloom.go:47). We keep the
exact string for correctness and add a 64-bit ``xxhash64`` identity column
for partitioning, bloom shards, and join keys — computed by Spark's
built-in (whole-stage-codegen) expression, never in Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spark's xxhash64 uses a fixed seed (42). A second, decorrelated 64-bit
# hash for bloom double-hashing is derived by hashing the column together
# with a salt literal — still one codegen'd expression.
def url_hash(col: Column | str) -> Column:
    """Primary 64-bit identity of a canonical URL string."""
    return F.xxhash64(col)


def url_hash2(col: Column | str) -> Column:
    """Independent second hash (bloom double-hashing: h_i = h1 + i*h2)."""
    return F.xxhash64(col, F.lit("bloom-salt"))


def shard_of(hash_col: Column, num_shards: int) -> Column:
    """Stable shard id in [0, num_shards) from a signed 64-bit hash."""
    return F.pmod(hash_col, F.lit(num_shards)).cast("int")


def simhash64(tokens_col: Column) -> Column:
    """64-bit SimHash over an array<string> token column, pure Spark SQL.

    Mirrors sample/fingerprint/fingerprint.go:12-115 (FNV-based simhash)
    in spirit: per-token 64-bit hash votes on each bit; the fingerprint
    sets bits with positive vote. Expressed with aggregate/transform
    higher-order functions so it stays JVM-side and codegen-friendly.
    """
    # votes: for each bit b, sum(+1 if bit set else -1) over token hashes
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(63)),
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.when(
            F.aggregate(
                tokens_col,
                F.lit(0),
                lambda v, t: v + F.when(F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
            )
            > 0,
            F.shiftleft(F.lit(1).cast("long"), b),
        ).otherwise(F.lit(0).cast("long")),
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (bk-tree predicate,
    sample/bktree/bktree.go:21-62 equivalent as a column expression)."""
    return F.bit_count(a.bitwiseXOR(b))
