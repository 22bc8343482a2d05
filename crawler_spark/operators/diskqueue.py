"""Q4 — DiskQueue: the bounded-memory wait queue with disk spill.

Reference behavior (queue/diskqueue/diskqueue.go):

- total order: ``(Next time, insertion uid)`` — FIFO at equal time
  (``compare``, diskqueue.go:84-93; the key encoding at :35-41);
- the in-memory rbtree holds at most ``limit`` items; a push past the
  limit spills the LARGEST ``limit/2+1`` keys to boltdb and remembers
  ``dbMinKey`` — the smallest key living on disk (Push, :220-263);
- a push keyed PAST ``dbMinKey`` bypasses memory entirely and lands in a
  write-behind buffer flushed to disk in batches (:238, writeToBuffer
  :266-287);
- a pop drains memory first — sound because memory keys never exceed
  ``dbMinKey`` — and when memory empties while the disk head is due,
  flushes the buffer and reloads the ``limit/2+1`` earliest disk items
  (Pop, :289-395).

Spark-first translation — the rbtree becomes a small cached DataFrame
(``hot``), boltdb becomes append-only sorted parquet frames, and the
boltdb cursor-delete becomes a *watermark*:

- each spill / buffer flush writes ONE parquet frame sorted by
  ``(next_ms, seq)``, so min/max row-group stats let reload scans prune
  files instead of reading the whole cold set;
- a reload takes the n smallest LIVE cold keys. Because that is always
  a PREFIX of the live key order, "deleting" them is recording the
  reload cutoff as each frame's watermark (a frame row with key <= wm
  is dead). A later spill may push keys BELOW an old cutoff back to
  disk (they were reloaded into memory, then displaced); that spill
  starts a fresh frame with its own empty watermark, so per-frame
  watermarks keep liveness exact where one global watermark would
  silently drop those rows;
- frames fold into one on a count cadence — the same amortized-rewrite
  compaction as the engine's LSM state path (plans/crawl.py).

The correctness invariant mirrored from the reference: every hot key <=
``db_min_key`` <= every live cold key, restored by every push / spill /
reload. Pop may therefore drain hot in key order and only touch disk
when hot empties — and if hot's head is not due, nothing on disk can be.

Memory holds at most ``limit`` queue rows no matter the queue
population — the property DiskQueue exists to provide at a 10^10
frontier — while all row-scale data stays in DataFrames; the driver
sees only scalar keys and counts.

Required input columns: ``next_ms: long`` and ``seq: long`` (unique —
the engine's insertion seq, operators/ordering.py); payload columns
ride along untouched.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_spark.state.ckpt import release_checkpoint

KEY_COLS = ["next_ms", "seq"]

#: (next_ms, seq) scalar pair; None = "no key" (empty side).
Key = Optional[tuple[int, int]]


def _key_gt(ms: Column, seq: Column, key: tuple[int, int]) -> Column:
    """(ms, seq) > key, lexicographically."""
    return (ms > F.lit(key[0])) | ((ms == F.lit(key[0])) & (seq > F.lit(key[1])))


def _min_key(df: DataFrame) -> tuple[int, int]:
    r = df.orderBy(*KEY_COLS).select(*KEY_COLS).first()
    return (r["next_ms"], r["seq"])


def _max_key(df: DataFrame) -> tuple[int, int]:
    r = (
        df.orderBy(F.col("next_ms").desc(), F.col("seq").desc())
        .select(*KEY_COLS)
        .first()
    )
    return (r["next_ms"], r["seq"])


@dataclass
class _Frame:
    path: str
    n_live: int
    min_key: tuple[int, int]
    #: rows with key <= wm were reloaded into hot and are dead here.
    wm: Key = None


@dataclass
class SpilledWaitQueue:
    """Bounded-memory wait queue over (hot cached DataFrame, cold
    parquet frames). See the module docstring for the reference
    mapping; tests/test_diskqueue.py mirrors the reference's own
    queue_test.go order/overflow suite."""

    spark: SparkSession
    workdir: str
    limit: int = 4096  # DefaultMemQueueSize, diskqueue.go:26
    buf_size: int = 256  # DefaultBufSize (write-behind), diskqueue.go:27
    compact_frames: int = 16

    _hot: Optional[DataFrame] = None
    _n_hot: int = 0
    _frames: list[_Frame] = field(default_factory=list)
    _buf: list[DataFrame] = field(default_factory=list)
    _n_buf: int = 0
    _db_min_key: Key = None  # lower bound on every live disk key
    _n_frame_files: int = 0
    _template: Optional[DataFrame] = None  # 0-row schema carrier

    def __post_init__(self):
        os.makedirs(self.workdir, exist_ok=True)

    def __len__(self) -> int:
        return self._n_hot + self._n_db()

    def _n_db(self) -> int:
        return self._n_buf + sum(f.n_live for f in self._frames)

    def _set_hot(self, ckpt: Optional[DataFrame], n: int) -> None:
        old = self._hot
        self._hot, self._n_hot = ckpt, n
        release_checkpoint(old)

    def _write_frame(self, df: DataFrame, n: int, min_key: tuple[int, int]) -> None:
        path = os.path.join(self.workdir, f"frame-{self._n_frame_files:06d}")
        self._n_frame_files += 1
        # sorted within files so parquet stats prune reload scans
        df.sortWithinPartitions(*KEY_COLS).write.mode("overwrite").parquet(path)
        self._frames.append(_Frame(path=path, n_live=n, min_key=min_key))

    def _live(self, fr: _Frame) -> DataFrame:
        df = self.spark.read.parquet(fr.path).select(*self._template.columns)
        if fr.wm is not None:
            df = df.where(_key_gt(F.col("next_ms"), F.col("seq"), fr.wm))
        return df

    def _cold_view(self) -> DataFrame:
        v: Optional[DataFrame] = None
        for fr in self._frames:
            d = self._live(fr)
            v = d if v is None else v.unionByName(d)
        return self._template if v is None else v

    # ------------------------------------------------------------ push
    def push(self, items: DataFrame) -> None:
        """Batch Push (diskqueue.go:220-263). Rows keyed past
        ``db_min_key`` go to the write-behind buffer; the rest join
        hot; a hot overflow spills the largest keys until hot is back
        at the reference's post-spill fill ``limit - (limit//2 + 1)``."""
        if self._template is None:
            self._template = items.limit(0).localCheckpoint()
        items = items.select(*self._template.columns)
        if self._db_min_key is not None:
            gt = _key_gt(F.col("next_ms"), F.col("seq"), self._db_min_key)
            to_disk = items.where(gt).localCheckpoint()
            n_disk = to_disk.count()
            if n_disk:
                self._buf.append(to_disk)
                self._n_buf += n_disk
                if self._n_buf >= self.buf_size:
                    self._flush_buffer()
            else:
                release_checkpoint(to_disk)
            to_hot = items.where(~gt)
        else:
            to_hot = items
        new_hot = to_hot if self._hot is None else self._hot.unionByName(to_hot)
        new_hot = new_hot.localCheckpoint()
        n_new = new_hot.count()
        if self._hot is not None and n_new == self._n_hot:
            release_checkpoint(new_hot)  # the whole batch went to disk
            return
        if n_new <= self.limit:
            self._set_hot(new_hot, n_new)
            return
        # Spill the largest keys. The reference overflows by ONE row per
        # Push and lands at fill limit - (limit//2 + 1); a batch push
        # overflows by many rows, so spill down to that same fill.
        n_keep = max(0, self.limit - (self.limit // 2 + 1))
        n_spill = n_new - n_keep
        spilled = (
            new_hot.orderBy(F.col("next_ms").desc(), F.col("seq").desc())
            .limit(n_spill)
            .localCheckpoint()
        )
        spill_min = _min_key(spilled)
        keep = new_hot.join(
            spilled.select(*KEY_COLS), KEY_COLS, "left_anti"
        ).localCheckpoint()
        self._write_frame(spilled, n_spill, spill_min)
        release_checkpoint(spilled)
        release_checkpoint(new_hot)
        if self._db_min_key is None or spill_min < self._db_min_key:
            self._db_min_key = spill_min
        self._set_hot(keep, n_keep)
        self._maybe_compact()

    # ----------------------------------------------------------- drain
    def _flush_buffer(self) -> None:
        if not self._buf:
            return
        df = self._buf[0]
        for d in self._buf[1:]:
            df = df.unionByName(d)
        self._write_frame(df, self._n_buf, _min_key(df))
        for d in self._buf:
            release_checkpoint(d)
        self._buf, self._n_buf = [], 0
        self._maybe_compact()

    def _reload(self) -> None:
        """Move the ``limit//2 + 1`` earliest live cold rows into hot
        (Pop's refill, diskqueue.go:352-395): take a prefix of the live
        key order, then advance every frame's watermark to the cutoff."""
        self._flush_buffer()
        n = min(self.limit // 2 + 1, self._n_db())
        if n <= 0:
            return
        loaded = self._cold_view().orderBy(*KEY_COLS).limit(n).localCheckpoint()
        cutoff = _max_key(loaded)
        survivors: list[_Frame] = []
        for fr in self._frames:
            if fr.wm is None or cutoff > fr.wm:
                n_dead = (
                    self._live(fr)
                    .where(~_key_gt(F.col("next_ms"), F.col("seq"), cutoff))
                    .count()
                )
                fr.n_live -= n_dead
                fr.wm = cutoff
            if fr.n_live > 0:
                survivors.append(fr)
            else:
                shutil.rmtree(fr.path, ignore_errors=True)
        self._frames = survivors
        new_hot = (
            loaded if self._hot is None else self._hot.unionByName(loaded)
        ).localCheckpoint()
        release_checkpoint(loaded)
        self._set_hot(new_hot, self._n_hot + n)
        # db_min_key: max(frame min, frame wm) is a cheap lower bound on
        # a frame's min LIVE key. A bound below the true min only sends
        # borderline pushes to disk instead of hot — never the reverse —
        # so the hot<=disk invariant is preserved.
        self._db_min_key = (
            min(
                (fr.min_key if fr.wm is None else max(fr.min_key, fr.wm))
                for fr in self._frames
            )
            if self._frames
            else None
        )

    def _maybe_compact(self) -> None:
        if len(self._frames) < self.compact_frames:
            return
        n = sum(f.n_live for f in self._frames)
        folded = self._cold_view().localCheckpoint()
        old = list(self._frames)
        self._frames = []
        if n > 0:
            self._write_frame(folded, n, _min_key(folded))
        release_checkpoint(folded)
        for fr in old:
            shutil.rmtree(fr.path, ignore_errors=True)

    # ------------------------------------------------------------- pop
    def pop(self, now_ms: int, max_n: int) -> DataFrame:
        """Batch Pop (diskqueue.go:289-395): up to ``max_n`` DUE rows
        (next_ms <= now) in (next_ms, seq) order. Drains hot; reloads
        from cold when hot empties while the disk head is due. If hot
        is nonempty but has no due row, nothing on disk is due either
        (hot keys <= db_min_key <= live cold keys)."""
        if self._template is None:
            raise ValueError("pop on a never-pushed queue")
        out: Optional[DataFrame] = None
        n_out = 0
        while n_out < max_n:
            if self._n_hot == 0:
                head = self._db_head()
                if head is None or head[0] > now_ms:
                    break
                self._reload()
                continue
            due = (
                self._hot.where(F.col("next_ms") <= F.lit(now_ms))
                .orderBy(*KEY_COLS)
                .limit(max_n - n_out)
                .localCheckpoint()
            )
            n_due = due.count()
            if n_due == 0:
                release_checkpoint(due)
                break
            remain = self._hot.join(
                due.select(*KEY_COLS), KEY_COLS, "left_anti"
            ).localCheckpoint()
            self._set_hot(remain, self._n_hot - n_due)
            out = due if out is None else out.unionByName(due)
            n_out += n_due
        if out is None:
            return self._template
        return out.orderBy(*KEY_COLS)

    def _db_head(self) -> Key:
        """Min key on disk including the write-behind buffer (the
        reference reads it straight off dbMinKey / the buffer head)."""
        if self._n_db() == 0:
            return None
        keys = [
            (fr.min_key if fr.wm is None else max(fr.min_key, fr.wm))
            for fr in self._frames
        ]
        if self._buf:
            b = self._buf[0]
            for d in self._buf[1:]:
                b = b.unionByName(d)
            keys.append(_min_key(b))
        return min(keys)

    def close(self) -> None:
        self._set_hot(None, 0)
        for d in self._buf:
            release_checkpoint(d)
        self._buf, self._n_buf, self._frames = [], 0, []
        release_checkpoint(self._template)
        shutil.rmtree(self.workdir, ignore_errors=True)


def pop_all_ordered(q: SpilledWaitQueue, batch: int = 1 << 20) -> DataFrame:
    """Drain the queue completely (now = +inf) in ``batch``-row pops,
    returning the pop log with its ordinal — the batch face the driver
    entry uses. The pop sequence of a correct spill queue equals the
    plain total order ``ORDER BY next_ms, seq`` over everything ever
    pushed, which is the entry's oracle. The ordinal window is PER POP
    BATCH (bounded rows), not over the whole log."""
    out: Optional[DataFrame] = None
    base = 0
    w = Window.orderBy(*[F.col(c).asc() for c in KEY_COLS])
    while len(q):
        got = q.pop(now_ms=(1 << 62), max_n=batch)
        n = got.count()
        if n == 0:
            break
        got = got.withColumn(
            "pop_ord", (F.row_number().over(w) - 1 + F.lit(base)).cast("long")
        )
        out = got if out is None else out.unionByName(got)
        base += n
    if out is None:
        raise ValueError("queue was empty")
    return out
