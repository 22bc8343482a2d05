"""M2/M4 — the store CONTRACT test, run over every backend, mirroring
the reference's storage_test.go:28-104 state machine step by step:

    PutNX → true, PutNX again → false, Exist, Get round-trip,
    Update (visit/last — depth immutable), Update (status),
    IsFinished false → Complete → true,
    second URL → false again → Complete → true,

plus the batch/persistence behaviors the DataFrame face adds: recover()
(PersistableStore, store.go:30-34), first-writer-wins inside one batch,
update-ignores-missing, and LSM read-resolution across compactions.
"""

import pytest
from pyspark.sql import functions as F

from crawler_spark.state.stores import (
    URL_STORE_SCHEMA,
    LSMStore,
    MemStore,
    ParquetStore,
    SQLStore,
)

BACKENDS = ["mem", "parquet", "lsm", "sql"]


def make_store(kind, spark, tmp_path):
    if kind == "mem":
        return MemStore(spark)
    if kind == "parquet":
        return ParquetStore(spark, str(tmp_path / "pq"))
    if kind == "lsm":
        return LSMStore(spark, str(tmp_path / "lsm"), compact_frames=4)
    return SQLStore(spark, str(tmp_path / "sql"))


def row(spark, url, depth=0, done=False, status=0, last_ms=0, num_visit=0, num_retry=0):
    return spark.createDataFrame(
        [(url, depth, done, status, last_ms, num_visit, num_retry)],
        URL_STORE_SCHEMA,
    )


U1 = "http://localhost:6060"
U2 = "http://localhost:6060/hello"


@pytest.mark.parametrize("kind", BACKENDS)
def test_store_contract(spark, tmp_path, kind):
    # storage_test.go:28-104, batch-faced
    s = make_store(kind, spark, tmp_path)
    try:
        assert s.put_nx(row(spark, U1, depth=3, last_ms=1000)) == 1
        assert s.put_nx(row(spark, U1, depth=9)) == 0  # NX: second writer loses
        assert s.exist(U1)
        assert not s.exist(U2)

        got = s.get(U1)
        assert (got["depth"], got["last_ms"], got["num_visit"], got["done"]) == (
            3, 1000, 0, False,
        )
        assert s.get_depth(U1) == 3
        assert s.get_depth(U2) == 0  # miss -> 0, like the reference

        # Update touches ONLY (status,last_ms,num_visit,num_retry)
        assert s.update(row(spark, U1, depth=77, status=0, last_ms=2000, num_visit=1)) == 1
        got = s.get(U1)
        assert (got["depth"], got["last_ms"], got["num_visit"]) == (3, 2000, 1)

        assert s.update(row(spark, U1, status=500, last_ms=2000, num_visit=1)) == 1
        assert s.get(U1)["status"] == 500

        # update of an absent url is ignored (reference: ErrItemNotFound)
        assert s.update(row(spark, U2, status=200)) == 0

        assert not s.is_finished()
        assert s.complete([U1]) == 1
        assert s.is_finished()
        assert s.get(U1)["done"]

        assert s.put_nx(row(spark, U2, depth=1)) == 1
        assert not s.is_finished()
        # recover() = the unfinished rows
        assert [r["url"] for r in s.recover().collect()] == [U2]
        assert s.complete([U2]) == 1
        assert s.is_finished()
        assert s.recover().count() == 0

        s.inc_visit_count()
        assert s.n_visit == 1
    finally:
        s.close()


@pytest.mark.parametrize("kind", BACKENDS)
def test_store_batch_semantics(spark, tmp_path, kind):
    s = make_store(kind, spark, tmp_path)
    try:
        # first-writer-wins WITHIN a batch: struct-min row per url
        batch = spark.createDataFrame(
            [
                ("http://a.test/", 5, False, 0, 100, 0, 0),
                ("http://a.test/", 2, False, 0, 50, 0, 0),
                ("http://b.test/", 1, False, 0, 10, 0, 0),
            ],
            URL_STORE_SCHEMA,
        )
        assert s.put_nx(batch) == 2
        assert s.get("http://a.test/")["depth"] == 2  # struct-min wins
        # batch update: one matched, one missing
        upd = spark.createDataFrame(
            [("http://b.test/", 0, False, 204, 999, 3, 1),
             ("http://c.test/", 0, False, 500, 1, 1, 1)],
            URL_STORE_SCHEMA,
        )
        assert s.update(upd) == 1
        got = s.get("http://b.test/")
        assert (got["status"], got["last_ms"], got["num_visit"], got["num_retry"]) == (
            204, 999, 3, 1,
        )
        # complete is idempotent on done rows (counts newly-done only)
        assert s.complete(["http://a.test/", "http://b.test/"]) == 2
        assert s.complete(["http://a.test/"]) == 0
    finally:
        s.close()


def test_lsm_store_resolution_across_compaction(spark, tmp_path):
    """Latest-frame-wins must hold before AND after the fold."""
    s = LSMStore(spark, str(tmp_path / "lsm2"), compact_frames=100)
    try:
        urls = [f"http://h{i}.test/" for i in range(6)]
        s.put_nx(
            spark.createDataFrame(
                [(u, i, False, 0, 0, 0, 0) for i, u in enumerate(urls)],
                URL_STORE_SCHEMA,
            )
        )
        # two update generations for the same urls: the later frame wins
        for gen, status in ((1, 301), (2, 200)):
            s.update(
                spark.createDataFrame(
                    [(u, 0, False, status, gen * 100, gen, 0) for u in urls[:4]],
                    URL_STORE_SCHEMA,
                )
            )
        s.complete(urls[:2])
        before = {r["url"]: r for r in s.snapshot().collect()}
        s.compact()
        after = {r["url"]: r for r in s.snapshot().collect()}
        assert before.keys() == after.keys()
        for u in urls:
            assert before[u] == after[u]
        assert after[urls[0]]["status"] == 200  # latest update frame won
        assert after[urls[0]]["done"] and not after[urls[5]]["done"]
        assert after[urls[5]]["status"] == 0  # never updated
        # post-compaction mutations still resolve against the new base
        assert s.update(
            spark.createDataFrame(
                [(urls[5], 0, False, 404, 7, 1, 1)], URL_STORE_SCHEMA
            )
        ) == 1
        assert s.get(urls[5])["status"] == 404
    finally:
        s.close()


def test_lsm_auto_compaction_cadence(spark, tmp_path):
    s = LSMStore(spark, str(tmp_path / "lsm3"), compact_frames=3)
    try:
        for i in range(7):
            s.put_nx(row(spark, f"http://h{i}.test/", depth=i))
        # cadence=3 → folds fired; frame lists stay short
        assert len(s._puts) + len(s._upds) + len(s._dones) < 3
        assert s.snapshot().count() == 7
        assert s.get("http://h4.test/")["depth"] == 4
    finally:
        s.close()
