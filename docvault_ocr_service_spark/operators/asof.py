"""As-of join — a temporal operator Spark's DataFrame API lacks natively.

``asof_join(left, right, ...)``: for each left row, the most recent right
row with ``right.order <= left.order`` within the same key — expressed as
a composition of built-in operators (union + window ``last(ignorenulls)``)
so Catalyst plans it as one shuffle on (key) + one window sort, no UDF:

    tag both sides → union → window per key ordered by (order, side)
    → last non-null right-payload up to the current row → filter left.

Tie rule: right rows sort before left rows at equal timestamps, so an
equal-timestamp right row *is* visible (the inclusive `<=` convention,
matching DuckDB's ASOF JOIN used as the oracle).

At scale this is one hash shuffle of |L|+|R| rows and a per-key sort —
the same cost profile a native as-of implementation would have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, *,
              key: str, order: str,
              payload_cols: tuple[str, ...],
              suffix: str = "_asof") -> DataFrame:
    """Left as-of join: every ``left`` row + latest ``right`` payload.

    ``right`` must be unique per (key, order) — pre-aggregate if not
    (duplicate right keys make any as-of semantics nondeterministic).
    """
    l_tagged = left.withColumn("__side", F.lit(1))
    r_tagged = (right
                .select(key, order,
                        *[F.col(c).alias(f"{c}{suffix}")
                          for c in payload_cols])
                .withColumn("__side", F.lit(0)))

    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (Window.partitionBy(key)
         .orderBy(F.col(order).asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    for c in payload_cols:
        merged = merged.withColumn(
            f"{c}{suffix}",
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w))
    return merged.where(F.col("__side") == 1).drop("__side")
