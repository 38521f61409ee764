"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column
names, and an order-insensitive value hash.  Run: python tools/check_oracle.py
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        if val == int(val) and abs(val) < 1e15:
            return str(int(val))
        return f"{val:.6f}"
    if hasattr(val, "isoformat"):
        return val.isoformat()
    if isinstance(val, (bytes, bytearray)):
        return val.hex()
    return str(val)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    only = sys.argv[1:] or None
    import __spark_entry__ as entrymod
    from pyg_timeseries_spark.session import get_spark

    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            results[name] = {"status": "SPARK_ERROR", "error": str(e)[:300]}
            print(f"{name:22s} SPARK_ERROR {str(e)[:160]}")
            continue
        if name not in oracles:
            results[name] = {"status": "ROWS_ONLY", "rows": len(srows)}
            print(f"{name:22s} rows-only   rows={len(srows)} ({time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            results[name] = {"status": "ORACLE_ERROR", "error": str(e)[:300]}
            print(f"{name:22s} ORACLE_ERROR {str(e)[:160]}")
            continue
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh = value_hash(srows, scols)
        oh = value_hash(orows, ocols)
        ok_hash = sh == oh
        status = "MATCH" if (ok_rows and ok_cols and ok_hash) else "MISMATCH"
        results[name] = {
            "status": status, "rows_spark": len(srows), "rows_oracle": len(orows),
            "cols_ok": ok_cols, "hash_ok": ok_hash,
        }
        print(
            f"{name:22s} {status:9s} rows={len(srows)}/{len(orows)} "
            f"cols_ok={ok_cols} hash_ok={ok_hash} ({time.time()-t0:.1f}s)"
        )
    n_bad = sum(1 for r in results.values() if r["status"] in ("MISMATCH", "SPARK_ERROR", "ORACLE_ERROR"))
    print(f"\n{len(results)} queries, {n_bad} failing")
    if not only:
        # filtered runs must not clobber the full-gate record
        with open(os.path.join(ROOT, "tools", "oracle_check.json"), "w") as f:
            json.dump(results, f, indent=1)
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
