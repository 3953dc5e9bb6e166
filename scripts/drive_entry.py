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

def norm(v):
    # Strictest-plausible-driver comparison: raw repr, NO normalization.
    # Decimal.normalize()/round(float) previously masked real divergences
    # (the round-1 decimal(35,10)-vs-DECIMAL(38,10) hash failures).
    import decimal
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        return None if math.isnan(v) else v
    if hasattr(v, "isoformat"): return v.isoformat()
    if isinstance(v, (list, tuple)): return tuple(norm(x) for x in v)
    return v

qs, os_ = E.queries(), E.oracle_sql()
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF)
    if name not in os_:
        print(f"{name}: rows-only rows={sdf.count()}")
        continue
    res = con.execute(os_[name]); cols = [d[0] for d in res.description]; drows = res.fetchall()
    srows = sdf.collect(); scols = sdf.columns
    ok_cols = sorted(cols) == sorted(scols)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sidx = {c: i for i, c in enumerate(scols)}
    sorder = [sidx[cols[i]] for i in order]
    dc = Counter(tuple(norm(r[i]) for i in order) for r in drows)
    sc = Counter(tuple(norm(r[i]) for i in sorder) for r in srows)
    print(f"{name}: rows spark={len(srows)} oracle={len(drows)} cols_match={ok_cols} values_match={dc==sc}")
    assert ok_cols and dc == sc and len(srows) == len(drows), name

# 3. probes: re-run a query on same session; run flagship at sf0.1
df2 = qs["windowed_analytics"](spark, SF)
print("PROBE rerun same session: rows=", df2.count())
df3 = qs["windowed_analytics"](spark, "/root/testdata/sf0.1")
print("PROBE sf0.1 scale: rows=", df3.count(), "schema stable:", df3.columns == df2.columns)
spark.stop()
print("ALL OK")
