"""Explicit skew handling for heavy-tailed page payloads (north rule).

Blob sizes on a web corpus are log-normal with multi-MB giants
(reference admission cap: 50 MB, ``app/validators.py:9``; the skew bomb is
a 500-page PDF in one row, SURVEY §4 item 1).  Hash-partitioning by url
balances *row counts* but not *bytes*, so a naive repartition leaves
straggler partitions holding the giants.

Policy (``route_by_size``):

- normal rows (``length(html) <= size_threshold``): salted repartition on
  ``xxhash64(url, salt)`` into ``n_partitions`` — uniform row counts, and
  the salt decorrelates the layout from any upstream bucketing of the
  same key.
- oversized rows: isolated into their own sub-DataFrame repartitioned so
  each partition carries ~``giants_per_partition`` giants — the unit of
  stragglerhood becomes one giant, not one giant plus a thousand normal
  rows stuck behind it in the same task.

Both halves run the same downstream map stage and are unioned after; on a
1000-executor cluster the oversized branch occupies a handful of tasks
while the wide branch streams, which AQE then coalesces post-union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SIZE_THRESHOLD = 256 * 1024  # bytes of html payload


def salted_repartition(df: DataFrame, n_partitions: int,
                       key: str = "url", salt: int = 1337) -> DataFrame:
    """Repartition by xxhash64(key, salt) — deterministic, uniform."""
    return df.repartition(
        n_partitions, F.xxhash64(F.col(key), F.lit(salt))
    )


def route_by_size(df: DataFrame, n_partitions: int,
                  size_threshold: int = DEFAULT_SIZE_THRESHOLD,
                  giants_per_partition: int = 1,
                  payload_col: str = "html") -> tuple[DataFrame, DataFrame]:
    """Split into (normal, oversized) with partitioning applied to each."""
    size = F.octet_length(F.col(payload_col))
    is_giant = size.isNotNull() & (size > F.lit(size_threshold))

    normal = salted_repartition(df.where(~F.coalesce(is_giant, F.lit(False))),
                                n_partitions)
    giants = df.where(F.coalesce(is_giant, F.lit(False)))
    # Spread giants thin: one (or few) per partition.  The giant count is
    # tiny relative to the corpus, so this repartition moves little data.
    giant_parts = max(n_partitions // 4, 1)
    giants = giants.repartition(giant_parts,
                                F.xxhash64(F.col("url"), F.lit(7331)))
    return normal, giants
