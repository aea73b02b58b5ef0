"""Sequence packing: lay a document stream into fixed-size context
windows for LLM pretraining.

The standard GPT-style recipe: concatenate documents in a deterministic
order into one token stream and cut it every ``window`` tokens —
documents may span window boundaries.  The assignment is pure prefix-sum
arithmetic, so the whole operator is native window functions (no UDF,
no driver loop):

    start_tok  = cumulative tokens before the doc      (running sum)
    first_win  = start_tok  div window
    last_win   = (start_tok + n_tokens - 1) div window

At 10^12 documents a single global ``Window.orderBy`` is a total sort —
fine for the per-shard variant (``order_col`` = position within an
already-sharded stream), and the ``shard_col`` parameter keeps the sort
partition-local: windows are then numbered per shard, which is exactly
how multi-node packing runs anyway (each worker packs its own shard;
window ids are (shard, window) pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(df: DataFrame, id_col: str, tokens_col: str,
                   window: int, order_col: str | None = None,
                   shard_col: str | None = None) -> DataFrame:
    """Assign each document its packed position in the token stream.

    Returns the input plus:
      - ``start_tok``  — stream offset of the doc's first token
      - ``first_win`` / ``last_win`` — context windows the doc touches
      - ``n_windows_spanned`` — ``last_win - first_win + 1``

    Zero-token docs are dropped (they occupy no stream positions).
    Deterministic for any ``order_col`` that is a total order per shard
    (defaults to ``id_col``).
    """
    order = order_col or id_col
    w = (Window.partitionBy(shard_col) if shard_col is not None
         else Window.partitionBy()).orderBy(order)
    n = F.col(tokens_col).cast("long")
    # `div` is integral division on longs — float division would lose
    # exactness past 2^53 cumulative tokens, the very scale this targets
    out = (df.where(n > 0)
           .withColumn("start_tok",
                       F.coalesce(F.sum(n).over(
                           w.rowsBetween(Window.unboundedPreceding, -1)),
                           F.lit(0)).cast("long"))
           .withColumn("first_win",
                       F.expr(f"CAST(start_tok div {int(window)} "
                              "AS BIGINT)"))
           .withColumn("last_win",
                       F.expr(f"CAST((start_tok + {tokens_col} - 1) "
                              f"div {int(window)} AS BIGINT)")))
    return out.withColumn(
        "n_windows_spanned",
        (F.col("last_win") - F.col("first_win") + 1).cast("long"))


def packing_stats(packed: DataFrame, tokens_col: str,
                  window: int) -> DataFrame:
    """Aggregate packing invariants: total tokens, number of windows,
    boundary-spanning docs, and fill ratio of the last window (every
    window but the last is full by construction)."""
    n = F.col(tokens_col).cast("long")
    return packed.agg(
        F.count("*").alias("n_docs"),
        F.sum(n).alias("total_tokens"),
        (F.max(F.col("last_win")) + 1).alias("n_windows"),
        F.sum((F.col("n_windows_spanned") > 1).cast("long"))
         .alias("n_spanning"),
        ((F.sum(n) - (F.max(F.col("last_win")).cast("long")) * window)
         / window).alias("last_fill"),
    )
