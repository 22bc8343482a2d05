"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and its ``oracle_sql()``
on DuckDB over the same parquet, comparing row count, column names, and an
order-insensitive value multiset (columns sorted by name, rows sorted).

Usage: python tools/check_entry.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from crawler_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main(names=None):
    spark = get_spark(app_name="check-entry", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if names and name not in names:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            fails.append(name)
            print(f"[SPARK-ERR] {name}: {type(e).__name__}: {str(e)[:300]}")
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows cols={scols} spark={t1-t0:.1f}s")
            if len(srows) == 0:
                fails.append(name)
                print(f"  !! zero rows")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            fails.append(name)
            print(f"[DUCK-ERR] {name}: {type(e).__name__}: {str(e)[:300]}")
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        status = []
        if len(sr) != len(dr):
            status.append(f"ROWS {len(sr)} vs {len(dr)}")
        if sc != dc:
            status.append(f"COLS {sc} vs {dc}")
        if not status and sr != dr:
            diffs = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
            status.append(f"VALUES {len(diffs)} differing rows; first: {sr[diffs[0]]} vs {dr[diffs[0]]}" if diffs else "VALUES tail mismatch")
        if status:
            fails.append(name)
            print(f"[MISMATCH] {name}: {'; '.join(status)}")
        else:
            print(f"[ok] {name}: {len(sr)} rows spark={t1-t0:.1f}s duck={time.time()-t1:.1f}s")
    print(f"\n{len(fails)} failing: {fails}" if fails else "\nALL OK")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(set(sys.argv[1:]) or None))
