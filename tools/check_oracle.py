"""Local mimic of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB at the given sf dir, compares row count,
column names/types, and an order-insensitive value hash (columns
sorted by name, rows sorted by their string repr — same spirit as the
driver's compare).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(val) -> str:
    import math

    if val is None:
        return "NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(val)
    if isinstance(val, bytes):
        return val.hex()
    if isinstance(val, (list, tuple)):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from searchengine_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        scols = [f.name for f in df.schema.fields]
        srows = [tuple(r) for r in df.collect()]
        spark_sec = time.time() - t0
        if name not in oracles:
            print(f"{name:28s} rows={len(srows):6d}  (rows-only, no oracle)  {spark_sec:.1f}s")
            continue
        rel = con.sql(oracles[name])
        ocols = [d[0] for d in rel.description]
        orows = rel.fetchall()
        sh, oh = table_hash(scols, srows), table_hash(ocols, orows)
        ok = len(srows) == len(orows) and sorted(scols) == sorted(ocols) and sh == oh
        status = "OK " if ok else "FAIL"
        print(
            f"{name:28s} {status} rows={len(srows)}/{len(orows)} "
            f"hash={sh}/{oh} {spark_sec:.1f}s"
        )
        if not ok:
            failures.append(name)
            if sorted(scols) != sorted(ocols):
                print(f"  spark cols: {sorted(scols)}\n  duck  cols: {sorted(ocols)}")
            sset = {"|".join(canon(v) for v in r) for r in srows}
            oset = {"|".join(canon(v) for v in r) for r in orows}
            for side, diff in (("spark-only", sset - oset), ("duck-only", oset - sset)):
                for ln in sorted(diff)[:5]:
                    print(f"  {side}: {ln}")
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
