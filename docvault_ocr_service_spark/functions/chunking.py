"""Token-window document chunking — the retrieval/embedding prep step.

Why it belongs in a training-data engine: every embedding, RAG and
long-context-curation pipeline slices documents into overlapping
token windows before anything else touches them (embedding models
have fixed input sizes; dedup/quality at chunk granularity catches
what doc-level misses).  This is that slicer, fully columnar.

Chunking contract (deterministic, engine-replayable):

- tokens are the corpus-wide whitespace convention
  (``textstats.lower_tokens`` keeps case here — chunk text must stay
  verbatim, so this module splits WITHOUT lowercasing);
- windows of ``chunk_tokens`` with ``overlap`` tokens shared between
  neighbours (stride = chunk_tokens − overlap);
- a document with ≤ ``chunk_tokens`` tokens yields exactly one chunk;
  otherwise start offsets are 0, stride, 2·stride, …, k·stride with
  k = ⌈(n − chunk_tokens) / stride⌉ — the last window always reaches
  the final token and is never a sub-window of its neighbour.

Scale shape: map-only (one transform + posexplode per doc); zero
shuffles — chunk rows land in the same partitions as their documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import verbatim_tokens


def chunk_documents(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", *,
                    chunk_tokens: int = 256,
                    overlap: int = 32) -> DataFrame:
    """→ (id, chunk_idx, chunk_text, n_tokens) — see module contract.

    ``overlap`` must be smaller than ``chunk_tokens``; empty/null
    documents yield no chunks.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap} / "
            f"{chunk_tokens}")
    stride = chunk_tokens - overlap

    base = docs.select(
        F.col(id_col),
        verbatim_tokens(F.col(text_col)).alias("__toks"))
    n = F.size("__toks")
    # k = ceil((n - chunk)/stride) in integer math; n <= chunk → k = 0
    k = F.when(n <= chunk_tokens, F.lit(0)).otherwise(
        ((n - chunk_tokens + stride - 1) / stride).cast("int"))
    pieces = F.transform(
        F.sequence(F.lit(0), k),
        lambda i: F.array_join(
            F.slice(F.col("__toks"), (i * stride + 1).cast("int"),
                    chunk_tokens), " "))
    exploded = base.select(
        F.col(id_col), n.alias("__n"),
        F.posexplode(F.when(n > 0, pieces).otherwise(
            F.array().cast("array<string>")))
        .alias("chunk_idx", "chunk_text"))
    # token count falls out of the window arithmetic — no second
    # tokenize pass over the chunk text
    return exploded.select(
        F.col(id_col), "chunk_idx", "chunk_text",
        F.least(F.lit(chunk_tokens),
                F.col("__n") - F.col("chunk_idx") * stride)
        .cast("long").alias("n_tokens"))
