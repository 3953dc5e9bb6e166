"""Consumer mimicking the round driver: smoke entry(), then per-query oracle compare at sf0.01."""
import os, sys, math, hashlib
from collections import Counter
sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
from stock_market_data_pipeline_spark.session import get_spark
import duckdb

spark = get_spark(master=os.environ.get("MIRROR_MASTER", "local[8]"), shuffle_partitions=int(os.environ.get("MIRROR_SHUFFLE", "16")))

# 1. smoke
df = E.entry(spark)
n = df.count()
print(f"SMOKE entry(): rows={n} schema={[f.name for f in df.schema.fields]}")
assert n > 0

# 2. per-query oracle at sf0.01
import os
SF = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(pdf):
    # Representation-strict driver mirror (r4 lesson): sort raw values the
    # way the driver does (crashes identically on unhashable array cells),
    # then render via astype(str) so int64 1 != float64 1.0 and -0.0 != 0.0.
    import pandas as pd
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("datetime64") and pdf[c].dtype != "datetime64[ns]":
            pdf[c] = pdf[c].astype("datetime64[ns]")  # duck [us] vs spark [ns]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns))
    pdf = pdf.reset_index(drop=True)
    # Series.astype(str), not DataFrame.astype(str): only the Series form
    # renders all-midnight datetime64[ns] date-only (matching Spark dates).
    return pd.DataFrame({c: pdf[c].astype(str) for c in pdf.columns})

qs, os_ = E.queries(), E.oracle_sql()
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF)
    if name not in os_:
        print(f"{name}: rows-only rows={sdf.count()}")
        continue
    spdf = canon(sdf.toPandas())
    dpdf = canon(con.execute(os_[name]).df())
    ok_cols = list(spdf.columns) == list(dpdf.columns)
    ok_vals = spdf.equals(dpdf)
    print(f"{name}: rows spark={len(spdf)} oracle={len(dpdf)} cols_match={ok_cols} strict_match={ok_vals}")
    assert ok_cols and ok_vals and len(spdf) == len(dpdf), name

# 3. probes: re-run a query on same session; run flagship at sf0.1
df2 = qs["windowed_analytics"](spark, SF)
print("PROBE rerun same session: rows=", df2.count())
df3 = qs["windowed_analytics"](spark, "/root/testdata/sf0.1")
print("PROBE sf0.1 scale: rows=", df3.count(), "schema stable:", df3.columns == df2.columns)
spark.stop()
print("ALL OK")
