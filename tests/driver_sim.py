"""Driver simulator: exercises the __spark_entry__ contract exactly the
way the round driver does — a plain SparkSession (none of our session.py
configs), entry() smoke, then every queries() entry at sf0.01 compared
against oracle_sql() via DuckDB.

Usage: python tests/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod
from tests.oracle_harness import compare


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # deliberately vanilla: the driver owns this session, not us. The
    # one exception: the builder-side sf0.1 sweep (241 queries in one
    # session, which the real driver never does — its gate runs at
    # sf0.01) ran out of the default 1g driver heap around query ~200
    # in round 7; SIM_DRIVER_MEM opts the extended sweep into a larger
    # heap without changing the vanilla default.
    import os

    builder = SparkSession.builder.master("local[8]").appName("driver-sim")
    mem = os.environ.get("SIM_DRIVER_MEM")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    df = entry_mod.entry(spark)
    rows = df.collect()
    print(f"entry(): {len(rows)} rows, schema={df.columns}", flush=True)

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    for name in sorted(queries):
        t0 = time.perf_counter()
        sdf = queries[name](spark, sf_dir)
        if name not in oracles:
            n = sdf.count()
            print(f"  {name}: rows-only check, {n} rows ({time.perf_counter()-t0:.2f}s)", flush=True)
            continue
        ok, msg = compare(sdf, oracles[name], sf_dir)
        status = "OK " if ok else "FAIL"
        print(f"  {status} {name} ({time.perf_counter()-t0:.2f}s) {'' if ok else msg}", flush=True)
        if not ok:
            failed.append(name)
    print(f"\n{len(queries) - len(failed)}/{len(queries)} queries match at {sf_dir}")
    if failed:
        print("FAILED:", failed)
        sys.exit(1)


if __name__ == "__main__":
    main()
