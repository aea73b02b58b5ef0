"""Driver-contract smoke tests: entry() shape, queries/oracles keyed
consistently, and a fast oracle-parity spot check at sf0.001."""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from docvault_ocr_service_spark.sources.tables import TPCH_TABLES

SF = "/root/testdata/sf0.001"

SPOT_CHECK = ("q1_pricing_summary", "doc_token_stats", "doc_langid",
              "knn_bruteforce", "doc_categories")


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"status", "category", "n_docs"} <= set(df.columns)


def test_every_oracle_has_a_query():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs, f"oracle {name} lacks a query"


@pytest.mark.parametrize("name", SPOT_CHECK)
def test_oracle_parity_smoke(spark, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    sdf = qs[name](spark, SF).toPandas()

    con = duckdb.connect()
    for t in TPCH_TABLES:
        path = os.path.join(SF, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{path}')")
    odf = con.execute(oracles[name]).df()

    assert len(sdf) == len(odf), f"{name}: row count"
    assert sorted(sdf.columns) == sorted(odf.columns)
    a = sdf.reindex(sorted(sdf.columns), axis=1)
    b = odf.reindex(sorted(odf.columns), axis=1)
    for c in a.columns:
        if a[c].dtype == object:
            a[c] = a[c].astype(str)
            b[c] = b[c].astype(str)
    a = a.sort_values(list(a.columns)).reset_index(drop=True)
    b = b.sort_values(list(b.columns)).reset_index(drop=True)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or \
                pd.api.types.is_float_dtype(b[c]):
            assert all(
                (pd.isna(x) and pd.isna(y))
                or math.isclose(float(x), float(y), rel_tol=1e-9,
                                abs_tol=1e-9)
                for x, y in zip(a[c], b[c])), f"{name}.{c}"
        else:
            assert a[c].astype(str).tolist() == \
                b[c].astype(str).tolist(), f"{name}.{c}"
