"""CDX-J crawl-index source — query the index, fetch only what's new.

Why it belongs in a training-data engine: web archives (Common Crawl,
Wayback) publish their content as WARC + a CDX(-J) index of captures:

    com,example)/path 20240101120000 {"url": ..., "mime": ...,
        "status": "200", "digest": "sha1:...", "length": ...,
        "offset": ..., "filename": ".../file.warc.gz"}

Production pipelines plan their WARC reads from this index instead of
scanning petabytes of WARC: filter by status/mime, keep the latest
capture per url, and — the big one — skip fetching captures whose
content digest is already in the corpus (most recrawled pages are
byte-identical).  This module is the Spark-side of that planning step;
`sources/warc.py` then reads only the (filename, offset, length)
triples that survive.

Scale shape: parsing is map-only (one regexp split + one `from_json`);
`latest_captures` is one window over urlkey; `plan_fetch` is one
left-anti join against the seen-digest table — the only corpus-scale
shuffle, carrying (digest) keys only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# the JSON part of a CDX-J line (string-typed fields per the format;
# numeric fields are cast after parsing)
_CDXJ_JSON_SCHEMA = ("url string, mime string, status string, "
                     "digest string, length string, offset string, "
                     "filename string")

_LINE_RE = r"^(\S+) (\d{14}) (\{.*\})$"


def surt_key(url: Column) -> Column:
    """SURT-style urlkey for a http(s) url: lowercased host with its
    labels reversed and comma-joined, ``)`` separator, then the path
    (query kept verbatim after ``?``).  The common core of the SURT
    canon (scheme/port/user stripping beyond the default is the
    indexer's job; this matches what the synthetic fixtures and most
    real CDX-J urlkeys look like for plain urls)."""
    u = F.lower(url)        # scheme/host/path all lowercase in SURT
    host = F.regexp_extract(u, r"^[a-z]+://(?:[^/?#@]*@)?([^/?#]+)", 1)
    host = F.regexp_replace(host, r":\d+$", "")          # explicit port
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    rest = F.regexp_extract(u, r"^[a-z]+://[^/?#]+([^#]*)", 1)
    path = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.concat(rev, F.lit(")"), path)


def parse_cdxj(df: DataFrame, line_col: str = "line") -> DataFrame:
    """CDX-J text lines → typed capture rows:

        (urlkey, ts string "yyyyMMddHHmmss", url, mime, status int,
         digest, length long, offset long, filename)

    Malformed lines (no 3-part shape, unparsable JSON) are dropped —
    an index is advisory, a bad line must not kill the plan.  Map-only.
    """
    line = F.col(line_col)
    # one anchored validity regex per line; the three fields then come
    # from cheap split/strip ops (an index has hundreds of millions of
    # lines — three full regex extractions per line is pure waste)
    parts = (df.where(line.rlike(_LINE_RE))
             .select(
                 F.split_part(line, F.lit(" "), F.lit(1))
                 .alias("urlkey"),
                 F.split_part(line, F.lit(" "), F.lit(2)).alias("ts"),
                 F.regexp_replace(line, r"^\S+ \d{14} ", "")
                 .alias("__json")))
    j = F.from_json(F.col("__json"), _CDXJ_JSON_SCHEMA)
    return parts.select(
        "urlkey", "ts",
        j["url"].alias("url"),
        j["mime"].alias("mime"),
        j["status"].cast("int").alias("status"),
        j["digest"].alias("digest"),
        j["length"].cast("long").alias("length"),
        j["offset"].cast("long").alias("offset"),
        j["filename"].alias("filename"),
    ).where(F.col("url").isNotNull())


def latest_captures(captures: DataFrame) -> DataFrame:
    """One row per urlkey: the newest capture (ties broken by digest
    then filename/offset for determinism).  One window shuffle on
    urlkey."""
    w = Window.partitionBy("urlkey").orderBy(
        F.col("ts").desc(), F.col("digest").asc(),
        F.col("filename").asc(), F.col("offset").asc())
    return (captures.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))


def read_cdxj(spark, path: str, glob: str = "*.cdx*") -> DataFrame:
    """Directory of CDX-J index shards → typed capture rows
    (``parse_cdxj`` schema).  Text-source scan: parallelism follows
    the index shards; the archive bytes are never touched here."""
    lines = (spark.read.format("text")
             .option("recursiveFileLookup", "true")
             .option("pathGlobFilter", glob)
             .load(path)
             .withColumnRenamed("value", "line"))
    return parse_cdxj(lines, "line")


def eligible_captures(captures: DataFrame,
                      statuses: tuple[int, ...] = (200,),
                      mime_prefixes: tuple[str, ...] = ("text/",),
                      ) -> DataFrame:
    """The CDX-server ``filter=`` convention: keep only wanted
    statuses / mime prefixes (applied BEFORE the latest-capture
    collapse — a url whose newest capture is an error/redirect must
    not lose its older, still-unseen 200 capture)."""
    mime_ok = F.lit(False)
    for p in mime_prefixes:
        mime_ok = mime_ok | F.col("mime").startswith(p)
    return captures.where(F.col("status").isin(list(statuses)) & mime_ok)


def plan_fetch(captures: DataFrame, seen_digests: DataFrame,
               statuses: tuple[int, ...] = (200,),
               mime_prefixes: tuple[str, ...] = ("text/",)) -> DataFrame:
    """The WARC read plan: captures filtered to the wanted statuses /
    mime prefixes FIRST (the CDX-server ``filter=`` convention), then
    the latest ELIGIBLE capture per urlkey, minus captures whose
    ``digest`` is already in ``seen_digests`` (column ``digest``) —
    unchanged recrawls are never fetched.  Filtering before the
    collapse matters: a url whose newest capture is an error/redirect
    must not lose its older, still-unseen 200 capture.  Returns the
    surviving capture rows (filename/offset/length ready for the WARC
    reader)."""
    eligible = eligible_captures(captures, statuses, mime_prefixes)
    return latest_captures(eligible).join(
        seen_digests.select("digest").distinct(), "digest", "left_anti")
