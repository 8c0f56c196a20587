"""Driver-style oracle check: run every queries()[k] on Spark at sf0.01 and
compare to oracle_sql()[k] in DuckDB — row count, column names, and exact
sorted values (floats compared bit-exactly, as the driver's value hash does).

Usage: python3 scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from ontologybasedkgcreation_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sorted(sdf.columns)
        sset = sorted(
            tuple(_norm(r[c]) for c in scols) for r in srows
        )
        if name not in oracles:
            print(f"{name:22s} rows-only: {len(srows)} rows (no oracle)")
            continue
        ores = con.execute(oracles[name])
        ocols_raw = [d[0] for d in ores.description]
        orows = ores.fetchall()
        ocols = sorted(ocols_raw)
        oset = sorted(
            tuple(_norm(row[ocols_raw.index(c)]) for c in ocols)
            for row in orows
        )
        ok_cols = scols == ocols
        ok_count = len(sset) == len(oset)
        ok_vals = sset == oset
        status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
        print(
            f"{name:22s} {status}  spark={len(sset)} duck={len(oset)} "
            f"cols={'=' if ok_cols else f'{scols} vs {ocols}'}"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_cols and ok_count:
                for a, b in zip(sset, oset):
                    if a != b:
                        print(f"   first diff:\n   spark: {a}\n   duck : {b}")
                        break
            elif ok_cols:
                sa, sb = set(sset), set(oset)
                print(f"   only-spark: {list(sa - sb)[:2]}")
                print(f"   only-duck : {list(sb - sa)[:2]}")
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all oracle checks passed")
    return 0


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


if __name__ == "__main__":
    sys.exit(main())
