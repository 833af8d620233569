"""Driver-style correctness self-check: run every __spark_entry__
query against its DuckDB oracle at a given scale factor and compare
row count, column names, and an order-insensitive value hash.

Usage: python scripts/selfcheck.py [--strict] [sf_dir] [query ...]

``--strict`` first lints every oracle SQL string for engine-stable
constructs (kafka_connect_jdbc_flatten_spark.oracle_lint — no bare
``/`` under FLOOR, no reserved-word output columns, explicit casts on
FLOOR and window SUMs) and fails fast on violations; the r02 driver
divergence came from exactly such a construct running under a DuckDB
build the repo doesn't control.
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math
import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    args = sys.argv[1:]
    strict = "--strict" in args
    if strict:
        args = [a for a in args if a != "--strict"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    if strict:
        from kafka_connect_jdbc_flatten_spark.oracle_lint import lint_all

        dirty = lint_all(entrymod.oracle_sql())
        for name, problems in sorted(dirty.items()):
            print(f"LINT  {name:28s} {'; '.join(problems)}")
        if dirty:
            print(f"\nFAILED lint: {len(dirty)} oracle(s) not engine-stable")
            sys.exit(1)
        print(f"lint  {len(entrymod.oracle_sql())} oracles engine-stable\n")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("selfcheck")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name:28s} spark error: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        t1 = time.time()
        if name not in oracles:
            print(
                f"weak  {name:28s} rows={len(srows):7d} (no oracle) "
                f"spark={t1 - t0:5.1f}s"
            )
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name:28s} oracle error: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        t2 = time.time()
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            sh = table_hash([c.lower() for c in scols], srows)
            oh = table_hash([c.lower() for c in ocols], orows)
            if sh != oh:
                problems.append(f"hash {sh} != {oh}")
                # show a sample diff
                sset = {
                    "|".join(
                        norm_cell(r[i])
                        for i in sorted(
                            range(len(scols)), key=lambda i: scols[i].lower()
                        )
                    )
                    for r in srows
                }
                oset = {
                    "|".join(
                        norm_cell(r[i])
                        for i in sorted(
                            range(len(ocols)), key=lambda i: ocols[i].lower()
                        )
                    )
                    for r in orows
                }
                for x in list(sset - oset)[:3]:
                    print(f"        spark-only: {x[:160]}")
                for x in list(oset - sset)[:3]:
                    print(f"        oracle-only: {x[:160]}")
        status = "ok  " if not problems else "FAIL"
        if problems:
            failed.append(name)
        print(
            f"{status}  {name:28s} rows={len(srows):7d} "
            f"spark={t1 - t0:5.1f}s duck={t2 - t1:5.1f}s {'; '.join(problems)}"
        )
    print(f"\n{'ALL OK' if not failed else 'FAILED: ' + ', '.join(failed)}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
