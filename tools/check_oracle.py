"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB at
the same sf, compare row count, column names, and an order-insensitive
value hash. Usage: python tools/check_oracle.py [sf_dir] [query ...]"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb
import pandas as pd

import __spark_entry__ as E
from prclz_spark.session import get_spark


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # The driver's canonicalizer sorts RAW columns: a list/ndarray
            # value raises TypeError there (r5 pack_sequences_uniform).
            # Fail loudly here so the gap can't hide behind str().
            bad = df[c].map(lambda v: isinstance(v, (list, tuple, dict))
                            or hasattr(v, "__array__"))
            if bad.any():
                raise TypeError(
                    f"column {c!r} holds non-scalar values; the driver "
                    "cannot canonicalize it — emit a scalar encoding"
                )
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(9)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in E._TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    qs = E.queries()
    oracles = E.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            if len(sdf) == 0:
                failed.append(name)
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {ex}")
            failed.append(name)
            continue
        a, b = norm(sdf), norm(odf)
        ok_cols = list(a.columns) == list(b.columns)
        ok_rows = len(a) == len(b)
        ok_vals = ok_cols and ok_rows and a.equals(b)
        if ok_vals:
            print(f"OK   {name}: {len(a)} rows  ({time.time()-t0:.1f}s)")
        else:
            print(f"FAIL {name}: cols {list(a.columns)} vs {list(b.columns)}; rows {len(a)} vs {len(b)}")
            if ok_cols and ok_rows:
                neq = (a != b).any(axis=1)
                print("  first diffs:")
                print(pd.concat([a[neq].head(3), b[neq].head(3)], keys=["spark", "duck"]))
            failed.append(name)
    print("\nFAILED:" if failed else "\nALL OK", failed if failed else "")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
