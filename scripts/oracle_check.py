"""Local approximation of the driver's CORRECTNESS harness.

Runs every __spark_entry__.queries() entry against its oracle_sql()
DuckDB twin over the same sf dir and compares row count, column names,
and an order-insensitive value multiset (floats rounded to 6).

    PYTHONPATH=/root/repo python scripts/oracle_check.py [sf_dir] [query ...]

Entries without an oracle print their row count (the driver's rows-only
check).  PYTHONPATH must include the repo root so executors can import
the package."""
import math
import os
import sys

import duckdb

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import __spark_entry__ as E
from mysql2es_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:]) or None

spark = get_spark(app_name="oracle_check", cores=8)
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = os.path.join(SF, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

qs, sqls = E.queries(), E.oracle_sql()
fails = []
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    try:
        sdf = fn(spark, SF).toPandas()
    except Exception as ex:
        fails.append((name, f"spark error: {ex}"))
        print(f"{name:28s} SPARK-ERROR {ex}")
        continue
    if name not in sqls:
        print(f"{name:28s} rows-only  {len(sdf)} rows")
        continue
    odf = con.execute(sqls[name]).fetchdf()
    ok_rows = len(sdf) == len(odf)
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    ok_schema = scols == ocols

    def canon(df, cols):
        out = set()
        for tup in df[cols].itertuples(index=False, name=None):
            row = []
            for v in tup:
                if isinstance(v, float):
                    if math.isnan(v):
                        row.append("nan")
                    else:
                        row.append(f"{round(v, 6):.6f}")
                elif isinstance(v, (bytes, bytearray)):
                    row.append(v.hex())
                else:
                    row.append(str(v))
            out.add(tuple(row))
        return out

    ok_vals = ok_rows and ok_schema and canon(sdf, scols) == canon(odf, ocols)
    status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
    print(f"{name:28s} {status}  rows={len(sdf)}/{len(odf)} schema={ok_schema}")
    if status == "FAIL":
        fails.append((name, f"rows={len(sdf)}/{len(odf)} schema={scols}/{ocols}"))

print("FAILS:", fails if fails else "none")
spark.stop()
