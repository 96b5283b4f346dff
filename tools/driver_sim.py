"""Driver simulation at a given SF (the verify-skill drive, scripted)."""
from pyspark.sql import SparkSession
import duckdb, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as e
spark = (SparkSession.builder.master("local[8]").appName("driver-sim")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
print("ENTRY rows:", len(e.entry(spark).collect()), flush=True)
qs, oracles = e.queries(), e.oracle_sql()
con = duckdb.connect()
SF = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
for t in ['region','nation','customer','supplier','part','orders',
          'lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
from tests.oracle_compare import assert_frames_match
ok = err = 0
for name in sorted(qs):
    try:
        sdf = qs[name](spark, SF).toPandas()
        if name in oracles:
            assert_frames_match(sdf, con.sql(oracles[name]).df(), name=name)
        ok += 1
    except Exception as ex:
        err += 1; print(name, "FAIL", str(ex)[:200], flush=True)
print(f"RESULT: {ok} ok, {err} fail")
