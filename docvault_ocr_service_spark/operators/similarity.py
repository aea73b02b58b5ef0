"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB pipeline needs:

- ``brute_force_topk``: exact cosine top-k — broadcast the (small) query
  set, one pass over the corpus, per-corpus-partition partial top-k via
  window rank after a cheap aggregate expression.  The dot product is a
  JVM-side ``aggregate(zip_with(...))`` — no Python in the loop.
- ``lsh_topk``: random-hyperplane LSH — a deterministic numpy projection
  per Arrow batch buckets both sides; candidates only join within a
  bucket (plus multi-probe neighbor buckets), then exact cosine re-ranks.
  At 10^12 vectors the bucket join replaces the cross product; recall is
  tunable via n_planes / n_probes.

Embedding-cosine near-duplicate detection reuses the same machinery:
``embedding_near_dup_pairs`` buckets the corpus against itself.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k by cosine: (query_id, vec_id, score, rank).

    ``queries`` must be small (it is broadcast); the corpus is scanned
    once.  Ties broken by vec_id ascending for determinism.
    """
    q = queries.select(F.col(query_id_col),
                       F.col(vec_col).alias("__qvec"))
    scored = (
        corpus.select(F.col(id_col), F.col(vec_col).alias("__cvec"))
        .crossJoin(F.broadcast(q))
        .withColumn("score",
                    cosine(F.col("__qvec").cast("array<double>"),
                           F.col("__cvec").cast("array<double>")))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select(query_id_col, id_col, "score", "rank"))


def filtered_topk(corpus: DataFrame, queries: DataFrame, k: int,
                  filter_col: str,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  query_id_col: str = "query_id",
                  broadcast_queries: bool = False) -> DataFrame:
    """Metadata-filtered exact top-k (the 'filtered vector search' every
    retrieval stack needs): each query carries a ``filter_col`` value
    and only corpus rows with the SAME value compete for its top-k.

    Scale shape: the equality predicate joins BEFORE any distance math —
    on a selective filter this prunes the distance computations to the
    matching partition of the corpus, instead of scoring everything and
    discarding.  By default Catalyst/AQE picks the join strategy from
    the query side's measured size (it broadcasts small frames on its
    own); pass ``broadcast_queries=True`` only when the caller KNOWS the
    query set is driver-small — a forced broadcast of a large query set
    would OOM instead of degrading to a shuffled join.
    Ties broken by id ascending, as in ``brute_force_topk``.
    """
    q = queries.select(F.col(query_id_col),
                       F.col(filter_col).alias("__fv"),
                       F.col(vec_col).alias("__qvec"))
    if broadcast_queries:
        q = F.broadcast(q)
    scored = (
        corpus.select(F.col(id_col), F.col(filter_col),
                      F.col(vec_col).alias("__cvec"))
        .join(q, F.col(filter_col) == F.col("__fv"))
        .withColumn("score",
                    cosine(F.col("__qvec").cast("array<double>"),
                           F.col("__cvec").cast("array<double>")))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select(query_id_col, id_col, filter_col, "score",
                          "rank"))


def _plane_matrix(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(dim, n_planes)).astype(np.float64)


def _table_buckets_udf(dim: int, n_planes: int, n_tables: int,
                       n_probes: int, seed: int, multiprobe: bool):
    """(table, bucket) pairs for OR-amplified hyperplane LSH.

    Each of the ``n_tables`` tables has independent planes (seed+table).
    Corpus side (``multiprobe=False``): one bucket per table.  Query side:
    additionally probes the buckets across the ``n_probes - 1``
    lowest-|margin| planes of each table (query-directed multi-probe) —
    recall grows with L·probes while the corpus index stays L entries/vec.
    """

    @F.pandas_udf(T.ArrayType(T.StructType([
        T.StructField("tbl", T.IntegerType()),
        T.StructField("bucket", T.LongType()),
    ])))
    def buckets(vecs: pd.Series) -> pd.Series:
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        planes = [
            _plane_matrix(dim, n_planes, seed + 1000 * t)
            for t in range(n_tables)
        ]
        out = []
        for v in vecs:
            vv = np.asarray(v, dtype=np.float64)
            entry = []
            for t in range(n_tables):
                proj = vv @ planes[t]
                base = int((proj > 0) @ weights)
                entry.append({"tbl": t, "bucket": base})
                if multiprobe:
                    for p in np.argsort(np.abs(proj))[: n_probes - 1]:
                        entry.append(
                            {"tbl": t, "bucket": base ^ int(weights[p])})
            out.append(entry)
        return pd.Series(out)

    return buckets


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int, dim: int,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id",
             n_planes: int = 8, n_tables: int = 8, n_probes: int = 3,
             seed: int = 42) -> DataFrame:
    """Approximate top-k: multi-table bucket join + exact cosine re-rank.

    Scale shape: the corpus index is ``n_tables`` (table, bucket) keys per
    vector; a query touches ``n_tables × n_probes`` buckets, i.e. a
    ``(probes/2^planes)``-fraction scan per table instead of the full
    cross product.  Tune planes up as the corpus grows to keep bucket
    occupancy roughly constant.
    """
    c_buckets = _table_buckets_udf(dim, n_planes, n_tables, 1, seed, False)
    q_buckets = _table_buckets_udf(dim, n_planes, n_tables, n_probes, seed,
                                   True)

    c = (corpus.select(F.col(id_col), F.col(vec_col).alias("__cvec"))
         .withColumn("__tb", F.explode(c_buckets(F.col("__cvec")))))
    q = (queries.select(F.col(query_id_col),
                        F.col(vec_col).alias("__qvec"))
         .withColumn("__tb", F.explode(q_buckets(F.col("__qvec")))))

    joined = (
        c.join(F.broadcast(q), c["__tb"] == q["__tb"])
         .drop("__tb")
         .dropDuplicates([query_id_col, id_col])
         .withColumn("score",
                     cosine(F.col("__qvec").cast("array<double>"),
                            F.col("__cvec").cast("array<double>")))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc())
    return (joined.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select(query_id_col, id_col, "score", "rank"))


def train_ivf_centroids(corpus: DataFrame, vec_col: str, dim: int,
                        n_centroids: int = 16, n_iters: int = 8,
                        sample_rows: int = 10000,
                        seed: int = 42) -> np.ndarray:
    """Coarse-quantizer centroids via deterministic mini k-means.

    Trains on a bounded sample pulled to the driver (a coarse quantizer
    needs thousands of points, not the corpus) — at 10^12 vectors this is
    the standard IVF recipe: sample, train small, broadcast centroids.
    The sample is a seeded Bernoulli ``sample()`` over the WHOLE corpus
    (``limit()`` would take the first partitions only — one shard's
    distribution — and the quantizer would mis-balance lists), then a
    seeded driver-side shuffle truncates to ``sample_rows``.
    """
    total = corpus.count()
    fraction = min(1.0, (2.0 * sample_rows) / max(total, 1))
    rng = np.random.RandomState(seed)
    collected = (corpus.select(vec_col)
                 .sample(fraction=fraction, seed=seed).collect())
    sample = np.asarray([list(r[0]) for r in collected], dtype=np.float64)
    if len(sample) > sample_rows:
        sample = sample[rng.choice(len(sample), size=sample_rows,
                                   replace=False)]
    centroids = sample[rng.choice(len(sample),
                                  size=min(n_centroids, len(sample)),
                                  replace=False)]
    for _ in range(n_iters):
        # cosine k-means: normalize, assign by dot product
        cn = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
        assign = (sample @ cn.T).argmax(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def _ivf_assign_udf(centroids: np.ndarray, nprobe: int):
    """(list_id array) — nearest ``nprobe`` centroid ids by cosine."""
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            vv = np.asarray(v, dtype=np.float64)
            n = np.linalg.norm(vv)
            sims = (cn @ vv) / n if n > 0 else np.zeros(len(cn))
            out.append([int(i) for i in np.argsort(-sims)[:nprobe]])
        return pd.Series(out)

    return assign


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int, dim: int,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id",
             n_centroids: int = 16, nprobe: int = 4,
             seed: int = 42) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into centroid
    lists, probe the query's ``nprobe`` nearest lists, exact re-rank.

    Scale shape: corpus carries ONE list id per vector (vs L entries for
    multi-table LSH); a query scans ``nprobe/n_centroids`` of the corpus.
    Centroids are trained once on a sample and broadcast in the UDF
    closure — at 10^12 rows the list assignment is the write-time
    partitioning of the vector table.
    """
    centroids = train_ivf_centroids(corpus, vec_col, dim, n_centroids,
                                    seed=seed)
    c_assign = _ivf_assign_udf(centroids, 1)
    q_assign = _ivf_assign_udf(centroids, nprobe)

    c = (corpus.select(F.col(id_col), F.col(vec_col).alias("__cvec"))
         .withColumn("list_id",
                     F.element_at(c_assign(F.col("__cvec")), 1)))
    q = (queries.select(F.col(query_id_col),
                        F.col(vec_col).alias("__qvec"))
         .withColumn("list_id",
                     F.explode(q_assign(F.col("__qvec")))))

    joined = c.join(F.broadcast(q), "list_id").withColumn(
        "score",
        cosine(F.col("__qvec").cast("array<double>"),
               F.col("__cvec").cast("array<double>")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc())
    return (joined.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select(query_id_col, id_col, "score", "rank"))


def embedding_near_dup_pairs(corpus: DataFrame, dim: int,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             min_cosine: float = 0.95,
                             n_planes: int = 12,
                             n_tables: int = 6,
                             max_bucket: int = 10_000,
                             seed: int = 42) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a, b, score) with a < b.

    OR-amplified multi-table self bucket-join (the ``lsh_topk``
    machinery): a pair is a candidate if it collides in ANY of the
    ``n_tables`` independent hyperplane tables — recall at high
    ``min_cosine`` approaches 1 − (1 − (1−θ/π)^planes)^tables instead of
    one table's single-sided miss rate.  Scale discipline:

    - the candidate self-join carries only (table, bucket, id) — vectors
      are joined back to the deduplicated candidate list afterwards
      (the slim-shuffle pattern the MinHash banding path uses);
    - buckets above ``max_bucket`` rows are dropped before the
      self-join: a degenerate bucket (near-constant embedding regions —
      exactly the near-duplicate-heavy corpora this targets) would go
      quadratic within the bucket.  The cap bounds any bucket's pair
      count; the multi-table OR makes it overwhelmingly likely a true
      pair still collides in a healthier table.
    """
    base = corpus.select(F.col(id_col).alias("doc"),
                         F.col(vec_col).alias("vec"))
    buckets = _table_buckets_udf(dim, n_planes, n_tables, 1, seed, False)
    keyed = (base.withColumn("__tb", F.explode(buckets(F.col("vec"))))
             .select("doc", "__tb"))

    sizes = keyed.groupBy("__tb").agg(F.count("*").alias("__n"))
    keyed = (keyed.join(sizes.where(F.col("__n") <= max_bucket), "__tb")
             .select("doc", "__tb"))

    cand = (
        keyed.alias("l").join(
            keyed.alias("r"),
            (F.col("l.__tb") == F.col("r.__tb"))
            & (F.col("l.doc") < F.col("r.doc")))
        .select(F.col("l.doc").alias("a"), F.col("r.doc").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    va = base.select(F.col("doc").alias("a"), F.col("vec").alias("va"))
    vb = base.select(F.col("doc").alias("b"), F.col("vec").alias("vb"))
    return (cand.join(va, "a").join(vb, "b")
            .withColumn("score", cosine(F.col("va").cast("array<double>"),
                                        F.col("vb").cast("array<double>")))
            .where(F.col("score") >= min_cosine)
            .select("a", "b", "score"))


def semdedup(corpus: DataFrame, dim: int,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_centroids: int = 16, min_cosine: float = 0.95,
             max_cluster: int = 100_000, keep: str = "far",
             seed: int = 42) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by embedding — cluster the corpus with the IVF coarse
    quantizer, find within-cluster pairs above ``min_cosine``, and keep
    ONE representative per duplicate group.  ``keep='far'`` keeps the
    member farthest from its cluster centroid (the paper's choice —
    prototypical members carry the least marginal information);
    ``keep='near'`` keeps the closest.  Ties (exact duplicates) keep
    the lowest id.  Returns the KEPT corpus rows.

    Scale shape — the published recipe IS the scalable one: centroids
    train on a bounded driver sample and broadcast
    (``train_ivf_centroids``); cluster assignment is one Arrow pass;
    the pairwise compare is confined within clusters (a self-join on
    ``list_id``), so the quadratic term is bounded by
    (corpus/n_centroids)² per cluster — at 10^12 docs you raise
    ``n_centroids`` with the corpus exactly as the paper does (they use
    ~10⁵ clusters for LAION-scale).  Clusters above ``max_cluster``
    rows are excluded from pairing (kept as-is) rather than going
    quadratic; the cap is a loud knob, not a silent truncation — raise
    ``n_centroids`` when it triggers.  Duplicate groups resolve through
    the SAME bounded connected-components + quality-window machinery
    the MinHash path uses (``dedup_keep_best``)."""
    from .dedup import dedup_keep_best

    t = dict(corpus.dtypes).get(id_col)
    if t not in ("tinyint", "smallint", "int", "bigint", "long"):
        raise ValueError(f"semdedup needs a numeric id column "
                         f"(got {id_col}: {t}); derive one first, "
                         f"e.g. xxhash64(url)")
    centroids = train_ivf_centroids(corpus, vec_col, dim, n_centroids,
                                    seed=seed)
    assign = _ivf_assign_udf(centroids, 1)
    cent_rows = [(int(i), [float(x) for x in c])
                 for i, c in enumerate(centroids)]
    cent_df = corpus.sparkSession.createDataFrame(
        cent_rows, "list_id int, __cent array<double>")

    base = (corpus.withColumn(
                "list_id", F.element_at(assign(F.col(vec_col)), 1))
            .join(F.broadcast(cent_df), "list_id")
            .withColumn("__cent_sim",
                        cosine(F.col(vec_col).cast("array<double>"),
                               F.col("__cent")))
            .drop("__cent"))
    base = base.persist()

    sizes = base.groupBy("list_id").agg(F.count("*").alias("__n"))
    pairable = (base.join(
        F.broadcast(sizes.where(F.col("__n") <= max_cluster)),
        "list_id").select("list_id", F.col(id_col).alias("doc"),
                          F.col(vec_col).alias("vec")))
    pairs = (
        pairable.alias("l").join(
            pairable.alias("r"),
            (F.col("l.list_id") == F.col("r.list_id"))
            & (F.col("l.doc") < F.col("r.doc")))
        .withColumn("__cos",
                    cosine(F.col("l.vec").cast("array<double>"),
                           F.col("r.vec").cast("array<double>")))
        .where(F.col("__cos") >= min_cosine)
        .select(F.col("l.doc").alias("a"), F.col("r.doc").alias("b")))

    quality = (F.col("__cent_sim") if keep == "near"
               else -F.col("__cent_sim"))
    kept = dedup_keep_best(base.withColumn("__q", quality),
                           pairs, id_col, "__q")
    out = kept.drop("__q", "__cent_sim", "list_id")
    # materialize the kept set eagerly so the cached assignment frame
    # can be released — otherwise repeated calls in one session pin
    # corpus-sized partitions for the session lifetime (same
    # discipline as fuzzy_contamination)
    out = out.localCheckpoint(eager=True)
    base.unpersist(blocking=False)
    return out


# ---------------------------------------------------------------------------
# int8 scalar quantization — the memory/bandwidth tier under IVF/LSH
# ---------------------------------------------------------------------------

def quantize_int8(df: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Symmetric per-vector max-abs scalar quantization:

        scale = max|v_i| / 127      codes_i = round(v_i / scale)

    → (id, codes array<int> in [-127, 127], scale double).  4× smaller
    per element than float32 (and 8× vs the float64 the distance math
    would otherwise promote to) — at 10^12 vectors the codes table is
    the difference between an in-memory scan and a spilled one.
    The all-zero vector quantizes to all-zero codes with scale 1.

    The quantization is a pure per-row expression (round is half-away-
    from-zero in both Spark and DuckDB), so a SQL twin reproduces the
    codes bit-for-bit.
    """
    v = F.col(vec_col).cast("array<double>")
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(mx > 0, mx / F.lit(127.0)).otherwise(F.lit(1.0))
    return df.select(
        F.col(id_col),
        F.transform(v, lambda x: F.round(x / scale, 0).cast("int"))
        .alias("codes"),
        scale.alias("scale"))


def int8_topk(corpus: DataFrame, queries: DataFrame, k: int,
              id_col: str = "vec_id", vec_col: str = "embedding",
              query_id_col: str = "query_id") -> DataFrame:
    """Approximate top-k by cosine over int8 codes.

    Both sides quantize per-vector, and the per-vector scales CANCEL
    in the cosine:

        cos(a, b) ≈ Σ qa_i·qb_i / (√Σ qa_i² · √Σ qb_i²)

    so scoring is an exact BIGINT dot product + two integer square
    norms per pair — the float appears only in the final per-row
    ratio, which is micro-quantized for deterministic ranking
    (ties → id ascending).  Returns (query_id, id, sim_micro, rank).

    Scale shape mirrors ``brute_force_topk`` (broadcast queries, one
    corpus scan) but moves 4× less data per element and keeps the
    accumulation integer; the same codes feed an IVF/LSH bucket stage
    unchanged for the sub-linear path.
    """
    def idot(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
            F.lit(0).cast("long"), lambda acc, v: acc + v)

    def inorm2(a: Column) -> Column:
        return F.aggregate(
            F.transform(a, lambda x: (x * x).cast("long")),
            F.lit(0).cast("long"), lambda acc, v: acc + v)

    # square norms are per-VECTOR projections, computed before the
    # pair join — only the O(dim) dot product runs per pair (the
    # interpreted higher-order aggregate is the expensive part)
    cq = quantize_int8(queries, query_id_col, vec_col) \
        .select(F.col(query_id_col), F.col("codes").alias("__qc"),
                inorm2(F.col("codes")).alias("__nq"))
    cc = quantize_int8(corpus, id_col, vec_col) \
        .select(F.col(id_col), F.col("codes").alias("__cc"),
                inorm2(F.col("codes")).alias("__nc"))

    scored = (cc.crossJoin(F.broadcast(cq))
              .select(F.col(query_id_col), F.col(id_col),
                      idot(F.col("__qc"), F.col("__cc")).alias("__d"),
                      F.col("__nq"), F.col("__nc")))
    sim = F.when(
        (F.col("__nq") > 0) & (F.col("__nc") > 0),
        F.col("__d")
        / (F.sqrt(F.col("__nq").cast("double"))
           * F.sqrt(F.col("__nc").cast("double")))).otherwise(F.lit(0.0))
    scored = scored.select(
        query_id_col, id_col,
        F.round(sim * F.lit(1e6), 0).cast("long").alias("sim_micro"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim_micro").desc(), F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id_col, id_col, "sim_micro", "rank"))
