"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
stringified with stable float formatting). Run:

    python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def canonicalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    return sorted_cols, out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from dp_search_data_importer_spark.session import get_spark

    spark = get_spark(master=os.environ.get("SPARK_GRAFT_MASTER", "local[8]"))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"  {name:28s} rows={len(srows):7d} (rows-only, no oracle) "
                  f"[{spark_t:.1f}s]")
            if len(srows) == 0:
                failures.append((name, "zero rows (rows-only check)"))
            continue
        orows_rel = con.execute(oracles[name])
        ocols = [d[0] for d in orows_rel.description]
        orows = orows_rel.fetchall()
        sc, sv = canonicalize(scols, srows)
        oc, ov = canonicalize(ocols, orows)
        status = "OK"
        detail = ""
        if sc != oc:
            status, detail = "SCHEMA-MISMATCH", f"spark={sc} duck={oc}"
        elif len(sv) != len(ov):
            status, detail = "ROWCOUNT-MISMATCH", f"spark={len(sv)} duck={len(ov)}"
        elif sv != ov:
            status = "VALUE-MISMATCH"
            diffs = [(a, b) for a, b in zip(sv, ov) if a != b][:3]
            detail = f"{sum(1 for a, b in zip(sv, ov) if a != b)} rows differ; e.g. {diffs}"
        print(f"  {name:28s} rows={len(sv):7d} {status} [{spark_t:.1f}s] {detail[:300]}")
        if status != "OK":
            failures.append((name, detail))
    print()
    if failures:
        print(f"FAILED: {len(failures)}")
        for n, d in failures:
            print(f"  {n}: {d[:500]}")
        return 1
    print("ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
