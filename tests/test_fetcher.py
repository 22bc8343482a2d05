"""Production fetch stage (S4) plumbing tests: salting + group batching."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.fetcher import (
    default_client,
    fetch_batch,
    salt_heavy_hosts,
)


@pytest.fixture(scope="module")
def selected(spark):
    rows = []
    for i in range(600):  # heavy host
        rows.append((f"http://big.test/p{i}", "big.test", i))
    for i in range(5):  # light host
        rows.append((f"http://small.test/p{i}", "small.test", 1000 + i))
    return spark.createDataFrame(rows, "url string, host_key string, seq long")


def test_default_client_is_stub():
    with pytest.raises(NotImplementedError):
        default_client(None)


def test_salting_splits_heavy_host(selected):
    s = salt_heavy_hosts(selected, max_batch_per_task=256)
    per = {(r["host_key"], r["salt"]): r["n"] for r in s.groupBy("host_key", "salt").count().withColumnRenamed("count", "n").collect()}
    assert per[("big.test", 0)] == 256
    assert per[("big.test", 1)] == 256
    assert per[("big.test", 2)] == 88
    assert per[("small.test", 0)] == 5
    assert ("small.test", 1) not in per


def test_fetch_batch_with_fake_client(selected):
    def fake_client(urls: pd.Series) -> pd.DataFrame:
        # deterministic fake: status from url suffix, echo body
        return pd.DataFrame(
            {
                "status": [404 if u.endswith("p3") else 200 for u in urls],
                "final_url": list(urls),
                "content_type": ["text/html"] * len(urls),
                "body": [u.encode() for u in urls],
            }
        )

    got = fetch_batch(selected, fake_client, max_batch_per_task=256)
    rows = {r["url"]: r for r in got.collect()}
    assert len(rows) == 605
    assert rows["http://big.test/p3"]["status"] == 404
    assert rows["http://small.test/p1"]["status"] == 200
    assert bytes(rows["http://small.test/p1"]["body"]) == b"http://small.test/p1"
    # seq is preserved for downstream deterministic ordering
    assert rows["http://big.test/p42"]["seq"] == 42
