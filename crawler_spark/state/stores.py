"""M2/M4 — the URL store contract over pluggable backends.

The reference defines one ``Store`` interface (store.go:12-28: Exist /
Get / GetDepth / PutNX / Update / Complete / IncVisitCount /
IsFinished, plus PersistableStore.Recover at :30-34) and implements it
four times: the in-memory map (store.go:36-151), boltdb, leveldb
(storage/levelstore/store.go) and Postgres (storage/sqlstore/store.go);
one contract test runs over all of them (storage/storage_test.go:28-104).

This module is the same shape in Spark terms — one batch-first contract,
four backends that differ ONLY in how the table is materialized:

- ``MemStore``       — the table is a locally-checkpointed DataFrame
                       (executor memory), rewritten per mutation; the
                       analog of the reference's map-under-mutex.
- ``ParquetStore``   — the table is ONE parquet directory on disk,
                       atomically replaced (tmp + rename) per mutation;
                       the boltdb analog (single-file store, every tx
                       rewrites pages, nothing required in memory).
- ``LSMStore``       — base parquet + append-only delta frames (puts /
                       updates / completes), latest-frame-wins read
                       resolution, count-cadence compaction; the
                       leveldb analog — and the same O(delta)-per-write
                       discipline as the engine's LSM state path
                       (plans/crawl.py _lsm_*).
- ``SQLStore``       — a Spark SQL catalog table mutated ONLY through
                       ``spark.sql`` statements (CTAS staging +
                       INSERT INTO / INSERT OVERWRITE); the Postgres
                       analog. On a real deployment the table is
                       Iceberg and the staged overwrites collapse to
                       ``MERGE INTO``; plain parquet tables make the
                       same statements run in this sandbox.

Batch semantics (the reference is row-at-a-time behind a mutex; the
DataFrame face takes batches):

- ``put_nx(df)``     — first-writer-wins: rows whose url is already
                       present are dropped; within a batch the
                       struct-min row per url wins (callers that need a
                       specific winner pre-aggregate, e.g. min_by seq —
                       the engine's L7 does).
- ``update(df)``     — overwrites ONLY (status, last_ms, num_visit,
                       num_retry) — the exact field set of URL.Update
                       (store.go:41-46); depth and done are immutable
                       through update. Rows for absent urls are ignored
                       (the reference returns ErrItemNotFound).
- ``complete(urls)`` — sets done; IsFinished == (#done >= #url), the
                       reference's counter comparison (store.go:145-149).
- ``recover()``      — the PersistableStore face: all unfinished rows
                       (store.go:30-34).
"""

from __future__ import annotations

import itertools
import os
import shutil
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from crawler_spark.state.ckpt import release_checkpoint

URL_STORE_SCHEMA = (
    "url string, depth int, done boolean, status int, "
    "last_ms long, num_visit int, num_retry int"
)
URL_COLS = ["url", "depth", "done", "status", "last_ms", "num_visit", "num_retry"]
#: the field set URL.Update copies (store.go:41-46)
UPDATE_COLS = ["status", "last_ms", "num_visit", "num_retry"]

_ids = itertools.count()


def _dedupe_first(df: DataFrame) -> DataFrame:
    """Deterministic one-row-per-url: struct-min over the value columns."""
    rest = [c for c in df.columns if c != "url"]
    return (
        df.groupBy("url")
        .agg(F.min(F.struct(*rest)).alias("_v"))
        .select("url", *[F.col(f"_v.{c}").alias(c) for c in rest])
    )


class UrlStore:
    """Contract base: read-modify-write over ``_read()`` / ``_commit()``.
    MemStore / ParquetStore use it directly; LSMStore / SQLStore
    override the mutations with their own write discipline."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.n_url = 0
        self.n_done = 0
        self.n_visit = 0  # IncVisitCount, store.go:131-136

    # -- backend seam ---------------------------------------------------
    def _read(self) -> DataFrame:
        raise NotImplementedError

    def _commit(self, df: DataFrame) -> None:
        raise NotImplementedError

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame([], URL_STORE_SCHEMA)

    # -- contract -------------------------------------------------------
    def put_nx(self, df: DataFrame) -> int:
        batch = _dedupe_first(df.select(*URL_COLS))
        cur = self._read()
        new = batch.join(cur.select("url"), "url", "left_anti").localCheckpoint()
        n = new.count()
        if n:
            self._commit(cur.unionByName(new))
        release_checkpoint(new)
        self.n_url += n
        return n

    def update(self, df: DataFrame) -> int:
        upd = _dedupe_first(df.select("url", *UPDATE_COLS))
        cur = self._read()
        n = cur.join(upd, "url", "left_semi").count()
        if n:
            u = upd.select(
                "url", *[F.col(c).alias(f"_u_{c}") for c in UPDATE_COLS]
            )
            merged = cur.join(u, "url", "left").select(
                "url",
                "depth",
                "done",
                *[
                    F.coalesce(F.col(f"_u_{c}"), F.col(c)).alias(c)
                    for c in UPDATE_COLS
                ],
            ).select(*URL_COLS)
            self._commit(merged)
        return n

    def complete_df(self, urls: DataFrame) -> int:
        u = urls.select("url").distinct()
        cur = self._read()
        newly = cur.where(~F.col("done")).join(u, "url", "left_semi").count()
        if newly:
            self._commit(
                cur.join(u.withColumn("_c", F.lit(True)), "url", "left")
                .withColumn("done", F.col("done") | F.coalesce("_c", F.lit(False)))
                .select(*URL_COLS)
            )
        self.n_done += newly
        return newly

    def complete(self, urls: Sequence[str]) -> int:
        return self.complete_df(
            self.spark.createDataFrame([(u,) for u in urls], "url string")
        )

    def exist(self, url: str) -> bool:
        return self._read().where(F.col("url") == url).limit(1).count() > 0

    def get(self, url: str) -> Optional[Row]:
        rows = self._read().where(F.col("url") == url).limit(1).collect()
        return rows[0] if rows else None

    def get_depth(self, url: str) -> int:
        r = self.get(url)
        return r["depth"] if r else 0  # reference returns 0 on miss

    def inc_visit_count(self) -> None:
        self.n_visit += 1

    def is_finished(self) -> bool:
        return self.n_done >= self.n_url

    def recover(self) -> DataFrame:
        """All unfinished rows (PersistableStore.Recover, store.go:30-34)."""
        return self._read().where(~F.col("done"))

    def snapshot(self) -> DataFrame:
        return self._read()

    def close(self) -> None:
        pass


class MemStore(UrlStore):
    def __init__(self, spark: SparkSession):
        super().__init__(spark)
        self._df: Optional[DataFrame] = None

    def _read(self) -> DataFrame:
        return self._df if self._df is not None else self._empty()

    def _commit(self, df: DataFrame) -> None:
        new = df.localCheckpoint()
        release_checkpoint(self._df)
        self._df = new

    def close(self) -> None:
        release_checkpoint(self._df)
        self._df = None


class ParquetStore(UrlStore):
    """Whole-table-on-disk backend (the boltdb analog): every commit
    writes a fresh parquet directory and renames it into place, so
    readers always see one complete table and nothing stays cached."""

    def __init__(self, spark: SparkSession, workdir: str):
        super().__init__(spark)
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self._gen = 0

    def _path(self) -> str:
        return os.path.join(self.workdir, f"table-{self._gen:06d}")

    def _read(self) -> DataFrame:
        if self._gen == 0:
            return self._empty()
        return self.spark.read.parquet(self._path())

    def _commit(self, df: DataFrame) -> None:
        nxt = os.path.join(self.workdir, f"table-{self._gen + 1:06d}")
        df.write.mode("overwrite").parquet(nxt)
        old = self._path() if self._gen else None
        self._gen += 1
        if old:
            shutil.rmtree(old, ignore_errors=True)

    def close(self) -> None:
        shutil.rmtree(self.workdir, ignore_errors=True)


class LSMStore(UrlStore):
    """Append-only backend (the leveldb analog): every mutation writes
    an O(batch) delta frame; reads resolve latest-frame-wins; compaction
    folds the frames into a fresh base on a frame-count cadence."""

    def __init__(self, spark: SparkSession, workdir: str, compact_frames: int = 32):
        super().__init__(spark)
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.compact_frames = compact_frames
        self._base_gen = 0  # 0 = empty base
        self._puts: list[str] = []
        self._upds: list[str] = []  # frame order IS update precedence
        self._dones: list[str] = []
        self._n_frames = 0

    # -- frame plumbing --------------------------------------------------
    def _write(self, kind: str, df: DataFrame) -> str:
        path = os.path.join(self.workdir, f"{kind}-{self._n_frames:06d}")
        self._n_frames += 1
        df.write.mode("overwrite").parquet(path)
        return path

    def _frames(self, paths: list[str]) -> Optional[DataFrame]:
        out = None
        for p in paths:
            d = self.spark.read.parquet(p)
            out = d if out is None else out.unionByName(d)
        return out

    def _base(self) -> DataFrame:
        if self._base_gen == 0:
            return self._empty()
        return self.spark.read.parquet(
            os.path.join(self.workdir, f"base-{self._base_gen:06d}")
        )

    def _read(self) -> DataFrame:
        # puts are url-unique across base+frames by put_nx construction
        v = self._base()
        puts = self._frames(self._puts)
        if puts is not None:
            v = v.unionByName(puts)
        upds = self._frames(
            [p for p in self._upds]
        )
        if upds is not None:
            # latest frame wins per url: frames carry _frame_no
            latest = (
                upds.groupBy("url")
                .agg(F.max_by(F.struct(*UPDATE_COLS), "_frame_no").alias("_v"))
                .select(
                    "url", *[F.col(f"_v.{c}").alias(f"_u_{c}") for c in UPDATE_COLS]
                )
            )
            v = v.join(latest, "url", "left").select(
                "url",
                "depth",
                "done",
                *[
                    F.coalesce(F.col(f"_u_{c}"), F.col(c)).alias(c)
                    for c in UPDATE_COLS
                ],
            )
        dones = self._frames(self._dones)
        if dones is not None:
            v = (
                v.join(dones.select("url").withColumn("_c", F.lit(True)).distinct(),
                       "url", "left")
                .withColumn("done", F.col("done") | F.coalesce("_c", F.lit(False)))
            )
        return v.select(*URL_COLS)

    # -- mutations: O(batch) appends --------------------------------------
    def put_nx(self, df: DataFrame) -> int:
        batch = _dedupe_first(df.select(*URL_COLS))
        new = batch.join(self._read().select("url"), "url", "left_anti")
        new = new.localCheckpoint()
        n = new.count()
        if n:
            self._puts.append(self._write("puts", new))
        release_checkpoint(new)
        self.n_url += n
        self._maybe_compact()
        return n

    def update(self, df: DataFrame) -> int:
        upd = _dedupe_first(df.select("url", *UPDATE_COLS))
        matched = upd.join(self._read().select("url"), "url", "left_semi")
        matched = matched.withColumn("_frame_no", F.lit(len(self._upds)))
        matched = matched.localCheckpoint()
        n = matched.count()
        if n:
            self._upds.append(self._write("upds", matched))
        release_checkpoint(matched)
        self._maybe_compact()
        return n

    def complete_df(self, urls: DataFrame) -> int:
        u = urls.select("url").distinct()
        newly = (
            self._read().where(~F.col("done")).join(u, "url", "left_semi")
            .select("url").localCheckpoint()
        )
        n = newly.count()
        if n:
            self._dones.append(self._write("dones", newly))
        release_checkpoint(newly)
        self.n_done += n
        self._maybe_compact()
        return n

    def _maybe_compact(self) -> None:
        if len(self._puts) + len(self._upds) + len(self._dones) >= self.compact_frames:
            self.compact()

    def compact(self) -> None:
        """Fold base + frames into a fresh base (the leveldb level-merge
        analog; same amortized discipline as plans/crawl._lsm_compact)."""
        if not (self._puts or self._upds or self._dones):
            return
        folded = self._read().localCheckpoint()
        self._base_gen += 1
        folded.write.mode("overwrite").parquet(
            os.path.join(self.workdir, f"base-{self._base_gen:06d}")
        )
        release_checkpoint(folded)
        for p in self._puts + self._upds + self._dones:
            shutil.rmtree(p, ignore_errors=True)
        if self._base_gen > 1:
            shutil.rmtree(
                os.path.join(self.workdir, f"base-{self._base_gen - 1:06d}"),
                ignore_errors=True,
            )
        self._puts, self._upds, self._dones = [], [], []

    def close(self) -> None:
        shutil.rmtree(self.workdir, ignore_errors=True)


class SQLStore(UrlStore):
    """Catalog-table backend (the Postgres analog): state lives in a
    Spark SQL table and every mutation is a ``spark.sql`` statement —
    CTAS staging then INSERT INTO (put_nx) or INSERT OVERWRITE
    (update/complete). With an Iceberg catalog the staged overwrites
    become single MERGE INTO statements; the statements here run on
    plain parquet tables so the backend is exercisable in-sandbox."""

    def __init__(self, spark: SparkSession, workdir: str):
        super().__init__(spark)
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.table = f"urlstore_{os.getpid()}_{next(_ids)}"
        spark.sql(
            f"CREATE TABLE {self.table} ({URL_STORE_SCHEMA}) USING PARQUET "
            f"LOCATION '{os.path.join(workdir, 'table')}'"
        )

    def _read(self) -> DataFrame:
        return self.spark.table(self.table).select(*URL_COLS)

    def _stage(self, select_sql: str) -> str:
        name = f"{self.table}_stage_{next(_ids)}"
        self.spark.sql(
            f"CREATE TABLE {name} USING PARQUET "
            f"LOCATION '{os.path.join(self.workdir, name)}' AS {select_sql}"
        )
        return name

    def _drop(self, name: str) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(os.path.join(self.workdir, name), ignore_errors=True)

    def put_nx(self, df: DataFrame) -> int:
        view = f"{self.table}_in_{next(_ids)}"
        _dedupe_first(df.select(*URL_COLS)).createOrReplaceTempView(view)
        stage = self._stage(
            f"SELECT d.* FROM {view} d LEFT ANTI JOIN {self.table} t ON d.url = t.url"
        )
        n = self.spark.sql(f"SELECT count(*) AS n FROM {stage}").first()["n"]
        if n:
            self.spark.sql(f"INSERT INTO {self.table} SELECT * FROM {stage}")
        self._drop(stage)
        self.spark.catalog.dropTempView(view)
        self.n_url += n
        return n

    def update(self, df: DataFrame) -> int:
        view = f"{self.table}_in_{next(_ids)}"
        _dedupe_first(df.select("url", *UPDATE_COLS)).createOrReplaceTempView(view)
        n = self.spark.sql(
            f"SELECT count(*) AS n FROM {self.table} t JOIN {view} u ON t.url = u.url"
        ).first()["n"]
        if n:
            sets = ", ".join(
                f"COALESCE(u.{c}, t.{c}) AS {c}" for c in UPDATE_COLS
            )
            stage = self._stage(
                f"SELECT t.url, t.depth, t.done, {sets} "
                f"FROM {self.table} t LEFT JOIN {view} u ON t.url = u.url"
            )
            self.spark.sql(
                f"INSERT OVERWRITE {self.table} "
                f"SELECT url, depth, done, status, last_ms, num_visit, num_retry "
                f"FROM {stage}"
            )
            self._drop(stage)
        self.spark.catalog.dropTempView(view)
        return n

    def complete_df(self, urls: DataFrame) -> int:
        view = f"{self.table}_in_{next(_ids)}"
        urls.select("url").distinct().createOrReplaceTempView(view)
        n = self.spark.sql(
            f"SELECT count(*) AS n FROM {self.table} t JOIN {view} u "
            f"ON t.url = u.url WHERE NOT t.done"
        ).first()["n"]
        if n:
            stage = self._stage(
                f"SELECT t.url, t.depth, "
                f"t.done OR u.url IS NOT NULL AS done, "
                f"t.status, t.last_ms, t.num_visit, t.num_retry "
                f"FROM {self.table} t LEFT JOIN {view} u ON t.url = u.url"
            )
            self.spark.sql(f"INSERT OVERWRITE {self.table} SELECT * FROM {stage}")
            self._drop(stage)
        self.spark.catalog.dropTempView(view)
        self.n_done += n
        return n

    def close(self) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.table}")
        shutil.rmtree(self.workdir, ignore_errors=True)
