"""Local mirror of the driver's correctness gate.  Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from tableextraction_spark.queries.oracle_check import check_query, duck_connection


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from __spark_entry__ import oracle_sql, queries
    from tableextraction_spark.session import get_spark

    spark = get_spark(app="oracle-check", master="local[8]", shuffle_partitions=8,
                      driver_memory="8g")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)

    qs, oracles = queries(), oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ok, detail = check_query(spark, con, fn, oracles.get(name), sf_dir)
        except Exception as exc:
            ok, detail = False, f"{type(exc).__name__}: {exc}"
        print(f"{'PASS' if ok else 'FAIL'} {name}: {detail} ({time.time()-t0:.1f}s)")
        if not ok:
            failures.append(name)
    print()
    if failures:
        print("FAILURES:", ", ".join(failures))
        sys.exit(1)
    print("all queries match their oracles")


if __name__ == "__main__":
    main()
