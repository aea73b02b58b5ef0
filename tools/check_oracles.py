"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare
row count + columns + values (order-insensitive, float-tolerant).

Usage: python tools/check_oracles.py [sf_dir] [only_query_name...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from docvault_ocr_service_spark.session import get_spark  # noqa: E402
from docvault_ocr_service_spark.sources.tables import TPCH_TABLES  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> str:
    if len(spark_df) != len(oracle_df):
        return f"ROWS {len(spark_df)} vs {len(oracle_df)}"
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return f"COLS {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    a, b = canon(spark_df), canon(oracle_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            ok = all(
                (pd.isna(x) and pd.isna(y))
                or (not pd.isna(x) and not pd.isna(y)
                    and math.isclose(float(x), float(y),
                                     rel_tol=1e-9, abs_tol=1e-9))
                for x, y in zip(av, bv))
        else:
            ok = av.astype(str).tolist() == bv.astype(str).tolist()
        if not ok:
            mism = [(i, av.iloc[i], bv.iloc[i]) for i in range(len(av))
                    if str(av.iloc[i]) != str(bv.iloc[i])][:3]
            return f"VALUES col={c} first_mismatches={mism}"
    # dtype report (informational — the driver may be stricter)
    dt = {c: (str(spark_df[c].dtype), str(oracle_df[c].dtype))
          for c in spark_df.columns
          if str(spark_df[c].dtype) != str(oracle_df[c].dtype)}
    return "OK" + (f" (dtype diff: {dt})" if dt else "")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    spark = get_spark(cores=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} SPARK ERROR: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:32s} rows-only: {len(sdf)} rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} ORACLE ERROR: {type(e).__name__}: {e}")
            failures += 1
            continue
        verdict = compare(name, sdf, odf)
        print(f"{name:32s} {verdict}  ({len(sdf)} rows)")
        if not verdict.startswith("OK"):
            failures += 1

    print(f"\n{'FAILURES: ' + str(failures) if failures else 'ALL OK'}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
