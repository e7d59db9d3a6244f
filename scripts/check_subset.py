"""Check a subset of contract queries vs their oracles.

Usage: python scripts/check_subset.py name1 name2 ... [--sf SF_DIR]
Same comparison as contract_check.py, but only the named entries —
the fast inner loop while developing a new operator.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from contract_check import TABLES, canon, values_match  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2:]

    import duckdb

    from adopt_spark.queries.registry import all_oracles, all_queries
    from adopt_spark.session import get_spark

    spark = get_spark("check_subset", cpus=16, shuffle_partitions=32)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{sf_dir}/{t}.parquet')")
    queries, oracles = all_queries(), all_oracles()
    bad = 0
    for name in args:
        t0 = time.time()
        sp = queries[name](spark, sf_dir).toPandas()
        oc = con.execute(oracles[name]).fetchdf()
        ok = (len(sp) == len(oc)
              and sorted(sp.columns) == sorted(oc.columns)
              and values_match(canon(sp), canon(oc)))
        bad += not ok
        print(f"{name:28s} {'PASS' if ok else 'FAIL':5s} "
              f"spark={len(sp)} oracle={len(oc)} ({time.time()-t0:.1f}s)",
              flush=True)
        if not ok and len(sp) < 30:
            print("spark:\n", canon(sp), "\noracle:\n", canon(oc))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
