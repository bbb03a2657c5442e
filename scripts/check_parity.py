"""Run the driver-style Spark-vs-DuckDB parity harness at an arbitrary
scale factor: python scripts/check_parity.py [sf_dir] [query ...]"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from tcr_kcore_spark.session import get_spark
import __spark_entry__ as entrymod
from tests.test_entry import compare_query

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
names = sys.argv[2:] or list(entrymod.queries())
spark = get_spark(cores=16, shuffle_partitions=16)
failed = []
oracles = entrymod.oracle_sql()
for name in names:
    t = time.time()
    try:
        if name not in oracles:
            # rows-only query (driver runs the weaker check): smoke-run it
            n = entrymod.queries()[name](spark, sf_dir).count()
            print(f"OK   {name:16s} {time.time()-t:6.1f}s (rows-only, {n} rows)", flush=True)
            continue
        compare_query(spark, name, sf_dir)
        print(f"OK   {name:16s} {time.time()-t:6.1f}s", flush=True)
    except AssertionError as ex:
        failed.append(name)
        print(f"FAIL {name:16s} {time.time()-t:6.1f}s {str(ex)[:300]}", flush=True)
    except Exception as ex:
        failed.append(name)
        print(f"ERR  {name:16s} {time.time()-t:6.1f}s {type(ex).__name__}: {str(ex)[:300]}", flush=True)
spark.stop()
print("FAILED:", failed if failed else "none", flush=True)
sys.exit(1 if failed else 0)
