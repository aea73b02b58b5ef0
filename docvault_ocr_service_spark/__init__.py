"""docvault_ocr_service_spark — a PySpark-native document-text-extraction
analytics engine.

A brand-new, Spark-first re-expression of the capabilities of the
``private-doc-vault/docvault-ocr-service`` reference (a FastAPI + Redis +
Tesseract per-document microservice): batched DataFrame stages over
Common-Crawl-style page tables, vectorized pandas/Arrow UDFs for the
extraction kernels, MERGE-based idempotent checkpointing, per-partition
lineage/metrics, and explicit skew handling — designed for 1000-executor /
100 TB scale while tested on ``local[N]``.

Layout
------
- ``extract/``    pure-Python extraction kernels (zero Spark imports)
- ``functions/``  pandas-UDF bindings + native-column text functions
- ``operators/``  DataFrame-level pipeline stages (skew, checkpoint, dedup,
                  similarity, lineage)
- ``sources/``    table readers/writers (parquet locally, Iceberg-shaped API)
- ``plans/``      end-to-end job plans (the flagship extraction job)
- ``streaming/``  Structured Streaming variants
"""

__version__ = "0.1.0"
