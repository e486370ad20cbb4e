import math
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import duckdb
import pandas as pd

import __spark_entry__ as m

con = duckdb.connect()
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
assert len(m.entry(spark).collect()) > 0, "smoke failed"
qs, osql = m.queries(), m.oracle_sql()


def canonrows(pdf):
    def c(v):
        if v is None:
            return None
        if isinstance(v, float):
            return None if math.isnan(v) else round(v, 9)
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(c(x) for x in v)
        try:
            if pd.isna(v):
                return None
        except (TypeError, ValueError):
            pass
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if type(v).__name__.startswith(("int", "uint")):
            return int(v)
        return v

    cols = sorted(pdf.columns)
    return sorted(
        [tuple(c(v) for v in t) for t in pdf[cols].itertuples(index=False, name=None)],
        key=repr,
    )


bad = []
for name in sorted(qs):
    s = qs[name](spark, SF).toPandas()
    if name in osql:
        o = con.execute(osql[name]).df()
        if len(s) != len(o) or canonrows(s) != canonrows(o):
            bad.append(name)
            print("MISMATCH", name, len(s), len(o), flush=True)
    else:
        if not s.columns.tolist():
            bad.append(name)
print("MISMATCH:", bad) if bad else print("ALL OK", len(qs), "queries,", len(osql), "oracles")
spark.stop()
