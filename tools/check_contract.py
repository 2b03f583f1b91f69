"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at a given sf dir; compare row count,
column names, and an order-insensitive value multiset (values normalized the
way a hash-compare plausibly would: floats rounded, rows sorted by sorted
column names). Usage: python tools/check_contract.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append((c, repr(v)))
        out.append(tuple(vals))
    out.sort()
    return out


def main(sf_dir: str) -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("contract-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oq = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oq:
            print(f"rows  {name}: {len(srows)} rows (rows-only check) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oq[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {e}")
            failures += 1
            continue
        dcols = sorted(ddf.columns)
        if scols != dcols:
            print(f"FAIL  {name}: columns {scols} vs {dcols}")
            failures += 1
            continue
        if len(srows) != len(ddf):
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(ddf)}")
            failures += 1
            continue
        drows = [
            {c: (None if v != v else v) if isinstance(v, float) else v for c, v in zip(ddf.columns, row)}
            for row in ddf.itertuples(index=False, name=None)
        ]
        sn = normalize([r.asDict() for r in srows], scols)
        dn = normalize(drows, dcols)
        if sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
            failures += 1
            continue
        print(f"ok    {name}: {len(srows)} rows match [{time.time()-t0:.1f}s]")

    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'} ({len(qs)} queries)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
