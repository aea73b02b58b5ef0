"""DuckDB oracle SQL for the driver contract (``__spark_entry__.oracle_sql``).

Each statement is the ANSI-SQL twin of a ``queries()`` entry, runnable by
DuckDB over the pre-registered parquet views.  The category scorer is
*generated* from the same pattern tables the engine uses
(``extract/patterns.py``) so both sides compute the identical scoring
function — keywords via ``contains(lower(text), kw)``, regexes via RE2
``regexp_matches`` with ``(?im)`` inline flags (the Python side compiles
with ``re.IGNORECASE | re.MULTILINE``).

Ops with no entry here (LSH ANN, full corpus pipeline, media stub) are
non-SQL-expressible and take the driver's rows-only check.
"""

from __future__ import annotations

from .extract import patterns as P
from .functions.textstats import (
    STOPWORDS_DE, STOPWORDS_EN, STOPWORDS_PL)


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _sql_list(items: tuple[str, ...]) -> str:
    return "[" + ", ".join(_sql_str(x) for x in items) + "]"


def _category_score_exprs() -> dict[str, str]:
    """Per-category score expression over a column named ``text``
    (lowered copy available as ``text_lower``)."""
    exprs = {}
    for name, (keywords, pats) in P.CATEGORIES.items():
        kw_hits = " + ".join(
            f"CASE WHEN contains(text_lower, {_sql_str(kw.lower())}) "
            "THEN 1 ELSE 0 END"
            for kw in keywords
        )
        pat_hits = " + ".join(
            f"CASE WHEN regexp_matches(text, {_sql_str('(?im)' + p)}) "
            "THEN 1 ELSE 0 END"
            for p in pats
        )
        # IEEE-754 DOUBLE throughout (not DuckDB DECIMAL): the engine
        # scores in Python floats where 3*0.2 = 0.6000000000000001, so a
        # DECIMAL-exact 0.6 tie would resolve differently on each side.
        exprs[name] = (
            f"least(CASE WHEN ({kw_hits}) > 0 "
            f"THEN 0.15::DOUBLE * ({kw_hits}) ELSE 0.0::DOUBLE END, "
            f"0.6::DOUBLE) "
            f"+ least(CASE WHEN ({pat_hits}) > 0 "
            f"THEN 0.2::DOUBLE * ({pat_hits}) ELSE 0.0::DOUBLE END, "
            f"0.7::DOUBLE)"
        )
    return exprs


def doc_categories_sql() -> str:
    names = sorted(P.CATEGORIES)
    score_exprs = _category_score_exprs()
    score_cols = ",\n    ".join(
        f"least({score_exprs[n]}, 1.0) AS s_{n}" for n in names)
    m = "greatest(" + ", ".join(f"s_{n}" for n in names) + ")"
    argmax = "CASE " + " ".join(
        f"WHEN s_{n} = __m THEN '{n}'" for n in names) + " END"
    return f"""
WITH base AS (
  SELECT coalesce(text, '') AS text,
         coalesce(lower(text), '') AS text_lower
  FROM documents
), scored AS (
  SELECT *, {score_cols} FROM base
), labeled AS (
  SELECT CASE WHEN len(trim(text)) < 3 THEN 'unknown'
              WHEN __m < 0.25 THEN 'unknown'
              ELSE {argmax} END AS category
  FROM (SELECT *, {m} AS __m FROM scored)
)
SELECT category, count(*) AS n_docs FROM labeled GROUP BY category
"""


_TOKENIZE = ("CASE WHEN text IS NULL OR trim(text) = '' THEN []::VARCHAR[] "
             "ELSE regexp_split_to_array(trim(text), '\\s+') END")
_TOKENIZE_LOWER = (
    "CASE WHEN text IS NULL OR trim(text) = '' THEN []::VARCHAR[] "
    "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END")


def build_oracles() -> dict[str, str]:
    en = _sql_list(STOPWORDS_EN)
    pl = _sql_list(STOPWORDS_PL)
    de = _sql_list(STOPWORDS_DE)

    oracles: dict[str, str] = {}

    oracles["q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

    oracles["q3_segment_revenue"] = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
HAVING round(sum(l_extendedprice * (1 - l_discount)), 2) > 1000
"""

    oracles["q5_nation_revenue"] = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""

    oracles["q4_order_priority"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > TIMESTAMP '1996-07-01')
GROUP BY o_orderpriority
"""

    oracles["q6_forecast_revenue"] = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

    oracles["q7_volume_shipping"] = """
SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_2')
GROUP BY 1, 2, 3
"""

    oracles["q10_returned_revenue"] = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0)
                     AS BIGINT)) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1996-07-01'
GROUP BY 1, 2, 3
HAVING sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0)
               AS BIGINT)) > 3000 * 10000
"""

    oracles["q14_promo_share"] = """
SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6)
         AS promo_revenue_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= '1996-09-01' AND l_shipdate < '1996-10-01'
"""

    oracles["q19_bracket_revenue"] = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""

    oracles["q15_top_supplier"] = """
WITH r AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000,
                             0) AS BIGINT)) AS BIGINT) AS total_revenue_e4
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_e4
FROM r JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue_e4 = (SELECT max(total_revenue_e4) FROM r)
"""

    oracles["q18_large_orders"] = """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""

    oracles["q_rollup_priority"] = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""

    oracles["q_pivot_segment"] = """
SELECT c_mktsegment,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_o,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_f,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_p
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""

    oracles["q_customers_without_orders"] = """
SELECT n_name, count(*) AS n_idle_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
"""

    oracles["q_top_suppliers_window"] = """
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem GROUP BY l_suppkey
)
SELECT n_name, s_suppkey, revenue,
       CAST(row_number() OVER (PARTITION BY n_name
                               ORDER BY revenue DESC, s_suppkey ASC)
            AS INT) AS rnk
FROM rev
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
QUALIFY rnk <= 3
"""

    oracles["q_distinct_part_types"] = """
SELECT count(DISTINCT p_type) AS n_types,
       count(DISTINCT p_brand) AS n_brands,
       CAST(sum(CASE WHEN p_size > 25 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_large
FROM part
"""

    oracles["events_hourly"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       count(*) AS n_events, round(sum(value), 3) AS sum_value
FROM events GROUP BY 1, 2
"""

    oracles["events_sessions"] = """
WITH g AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM g
), per AS (
  SELECT user_id, session_no, count(*) AS n_events,
         round(sum(value), 3) AS session_value
  FROM s GROUP BY 1, 2
)
SELECT user_id, count(*) AS n_sessions,
       max(n_events) AS max_session_events,
       round(sum(session_value), 3) AS total_value
FROM per GROUP BY user_id
"""

    oracles["events_value_quantiles"] = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(min(value), 6) AS vmin,
       round(max(value), 6) AS vmax
FROM events GROUP BY event_type
"""

    oracles["events_asof_purchase"] = """
WITH purchases AS (
  SELECT user_id, ts, max(value) AS pvalue
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
), clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), joined AS (
  SELECT c.user_id, p.pvalue
  FROM clicks c ASOF LEFT JOIN purchases p
    ON c.user_id = p.user_id AND c.ts >= p.ts
)
SELECT user_id, count(*) AS n_clicks,
       CAST(sum(CASE WHEN pvalue IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS clicks_before_any_purchase,
       round(sum(coalesce(pvalue, 0.0)), 3) AS sum_asof_value
FROM joined GROUP BY user_id
"""

    oracles["doc_token_stats"] = f"""
WITH t AS (SELECT lang, len({_TOKENIZE}) AS n_tok FROM documents)
SELECT lang, count(*) AS n_docs, round(avg(n_tok), 6) AS avg_tokens,
       CAST(max(n_tok) AS BIGINT) AS max_tokens,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens
FROM t GROUP BY lang
"""

    oracles["doc_stopword_punct"] = f"""
WITH t AS (
  SELECT lang,
         {_TOKENIZE_LOWER} AS toks,
         text
  FROM documents
), r AS (
  SELECT lang,
         CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks, x -> list_contains({en}, x)))
                        AS DOUBLE) / len(toks)
              ELSE 0.0 END AS sw,
         CASE WHEN text IS NOT NULL AND len(text) > 0
              THEN CAST(len(regexp_replace(text,
                   '[\\p{{L}}\\p{{N}}\\s]', '', 'g')) AS DOUBLE) / len(text)
              ELSE 0.0 END AS pr
  FROM t
)
SELECT lang, round(avg(sw), 6) AS avg_stopword_ratio,
       round(avg(pr), 6) AS avg_punct_ratio
FROM r GROUP BY lang
"""

    # sequence packing: prefix-sum window assignment recomputed in SQL
    oracles["pack_windows"] = f"""
WITH t AS (
  SELECT doc_id, CAST(len({_TOKENIZE}) AS BIGINT) AS n_tokens
  FROM documents WHERE doc_id < 300
), s AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start_tok
  FROM t WHERE n_tokens > 0
)
SELECT doc_id, n_tokens, start_tok,
       CAST(start_tok // 512 AS BIGINT) AS first_win,
       CAST((start_tok + n_tokens - 1) // 512 AS BIGINT) AS last_win,
       CAST((start_tok + n_tokens - 1) // 512 - start_tok // 512 + 1
            AS BIGINT) AS n_windows_spanned
FROM s
"""

    # SQL re-derivation of functions/web.py::canonicalize_url (regex
    # head split, lowercase authority, default-port & fragment strip)
    # over the same synthetic crawl URLs
    oracles["url_host_stats"] = """
WITH d AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END)
    || (CASE WHEN doc_id % 4 = 0 THEN 'HoSt' ELSE 'host' END)
    || (doc_id % 23)
    || (CASE WHEN doc_id % 4 = 0 THEN '.ExAmple.COM'
             ELSE '.example.com' END)
    || (CASE WHEN doc_id % 3 = 0 THEN
          (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END)
        ELSE '' END)
    || '/Path/' || doc_id
    || (CASE WHEN doc_id % 5 = 0 THEN '?ref=Abc' ELSE '' END)
    || (CASE WHEN doc_id % 7 = 0 THEN '#Frag' ELSE '' END) AS raw_url
  FROM documents WHERE doc_id < 400
), c AS (
  SELECT doc_id, raw_url,
         regexp_replace(raw_url, '#.*$', '') AS no_frag,
         regexp_extract(regexp_replace(raw_url, '#.*$', ''),
                        '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)', 1) AS head
  FROM d
), c2 AS (
  SELECT doc_id, raw_url,
    (CASE WHEN lower(head) LIKE 'http://%'
          THEN regexp_replace(lower(head), ':80$', '')
          WHEN lower(head) LIKE 'https://%'
          THEN regexp_replace(lower(head), ':443$', '')
          ELSE lower(head) END)
    || substring(no_frag, len(head) + 1) AS url
  FROM c
)
SELECT regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) AS host,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN url LIKE '%?%' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_query,
       CAST(sum(CASE WHEN url <> raw_url THEN 1 ELSE 0 END) AS BIGINT)
         AS n_canon_changed
FROM c2 GROUP BY host
"""

    # token-budget mixing: same md5 order, same prefix-sum cutoff
    oracles["doc_token_budget_mix"] = f"""
WITH t AS (
  SELECT doc_id, source, CAST(len({_TOKENIZE}) AS BIGINT) AS n_tok
  FROM documents
), s AS (
  SELECT doc_id, source, n_tok,
         coalesce(sum(n_tok) OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS before
  FROM t
)
SELECT doc_id, source, n_tok FROM s WHERE before < 1500
"""

    # sitemap extraction must invert the per-host XML construction
    oracles["sitemap_url_extraction"] = """
SELECT 'h' || (doc_id % 10) AS host,
       'https://h' || (doc_id % 10) || '/p/' || doc_id || '?a=1&b=2'
         AS url
FROM documents WHERE doc_id < 400
"""

    # robots politeness: every verdict re-derived from the same rule
    # literals (RFC 9309: matching is against path-plus-query, longest
    # prefix wins, Allow wins ties — the ?q= rules are the longest)
    oracles["robots_filter_stats"] = """
WITH d AS (
  SELECT doc_id, doc_id % 23 AS k,
         '/Path/' || doc_id || '?q=' || (doc_id % 7) AS pq
  FROM documents WHERE doc_id < 400
)
SELECT doc_id,
       CASE WHEN k % 3 = 2 THEN TRUE
            WHEN k % 3 = 1 THEN FALSE
            WHEN pq LIKE '/Path/3?q=3%' THEN FALSE
            WHEN pq LIKE '/Path/72?q=2%' THEN FALSE
            WHEN pq LIKE '/Path/12%' THEN TRUE
            WHEN pq LIKE '/Path/1%' THEN FALSE
            ELSE TRUE END AS allowed
FROM d
"""

    # Unicode NFC twin: DuckDB's nfc_normalize vs the engine's pandas
    # UDF (unicodedata) — decomposed salt must merge on both sides
    oracles["doc_nfc_stats"] = """
WITH d AS (
  SELECT text || ' cafe' || chr(769) || ' le' || chr(769) || 'vy A'
           || chr(778) AS t
  FROM documents WHERE doc_id < 300 AND text IS NOT NULL
)
SELECT count(*) AS n_docs,
       CAST(sum(len(t)) AS BIGINT) AS chars_raw,
       CAST(sum(len(nfc_normalize(t))) AS BIGINT) AS chars_nfc,
       CAST(sum(CASE WHEN nfc_normalize(t) <> t THEN 1 ELSE 0 END)
            AS BIGINT) AS n_changed
FROM d
"""

    # full SQL twin of functions/textstats.py::quality_score — same
    # component order and the same left-associative double arithmetic,
    # so both sides share IEEE-754 rounding before round(..., 6)
    oracles["source_quality_stats"] = f"""
WITH t AS (
  SELECT source, text, {_TOKENIZE} AS toks, {_TOKENIZE_LOWER} AS ltoks
  FROM documents
), c AS (
  SELECT source,
    len(toks) AS n_tok,
    CASE WHEN len(ltoks) > 0
         THEN CAST(len(list_filter(ltoks, x -> list_contains({en}, x)))
                   AS DOUBLE) / len(ltoks) ELSE 0.0 END AS sw,
    CASE WHEN len(toks) > 0
         THEN CAST(list_sum(list_transform(toks, x -> len(x)))
                   AS DOUBLE) / len(toks) ELSE 0.0 END AS wl,
    CASE WHEN text IS NOT NULL AND len(text) > 0
         THEN CAST(len(regexp_replace(text, '[\\p{{L}}\\p{{N}}\\s]', '',
                                      'g')) AS DOUBLE) / len(text)
         ELSE 0.0 END AS pr,
    CASE WHEN text IS NOT NULL AND len(text) > 0
         THEN CAST(len(regexp_replace(text, '[^0-9]', '', 'g'))
                   AS DOUBLE) / len(text) ELSE 0.0 END AS dr
  FROM t
), q AS (
  SELECT source, n_tok,
    least(n_tok / 20.0, 1.0) * 0.25
    + least(sw * 4, 1.0) * 0.25
    + (CASE WHEN wl >= 3 AND wl <= 10 THEN 1.0 ELSE 0.3 END) * 0.2
    + greatest(0.0, 1.0 - pr * 3) * 0.15
    + greatest(0.0, 1.0 - dr * 2) * 0.15 AS q
  FROM c
)
SELECT source, count(*) AS n_docs, round(avg(q), 6) AS avg_quality,
       round(min(q), 6) AS min_quality, round(max(q), 6) AS max_quality,
       round(avg(n_tok), 6) AS avg_tokens
FROM q GROUP BY source
"""

    oracles["doc_langid"] = f"""
WITH t AS (SELECT lang, {_TOKENIZE_LOWER} AS toks FROM documents),
v AS (
  SELECT lang,
         len(list_filter(toks, x -> list_contains({en}, x))) AS ve,
         len(list_filter(toks, x -> list_contains({pl}, x))) AS vp,
         len(list_filter(toks, x -> list_contains({de}, x))) AS vd
  FROM t
)
SELECT lang,
       CASE WHEN greatest(ve, vp, vd) = 0 THEN 'und'
            WHEN ve >= vp AND ve >= vd THEN 'en'
            WHEN vp >= vd THEN 'pl'
            ELSE 'de' END AS lang_pred,
       count(*) AS n_docs
FROM v GROUP BY 1, 2
"""

    oracles["doc_exact_dups"] = """
WITH g AS (
  SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS dup_count
  FROM documents GROUP BY md5(text)
)
SELECT count(*) AS n_groups, CAST(sum(dup_count) AS BIGINT) AS n_docs,
       max(dup_count) AS max_group,
       CAST(sum(CASE WHEN dup_count > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_groups
FROM g
"""

    oracles["doc_fingerprints"] = """
SELECT lang,
       count(DISTINCT md5(regexp_replace(lower(trim(text)),
                                         '\\s+', ' ', 'g')))
         AS n_distinct_fp,
       count(*) AS n_docs
FROM documents GROUP BY lang
"""

    oracles["doc_categories"] = doc_categories_sql()

    oracles["doc_sample_tenth"] = f"""
WITH sample AS (
  SELECT * FROM documents
  WHERE ('0x' || substr(md5(text), 1, 8))::BIGINT % 10 = 0
), t AS (
  SELECT lang, doc_id, len({_TOKENIZE}) AS n_tok FROM sample
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       min(doc_id) AS min_id
FROM t GROUP BY lang
"""

    oracles["invoice_metadata_from_orders"] = """
SELECT o_orderkey AS okey,
       CAST(2 AS INT) AS n_dates,
       strftime(o_orderdate, '%Y-%m-%d') AS first_date,
       CAST(1 AS INT) AS n_amounts,
       CAST(o_orderkey % 900 + 100 AS DOUBLE) AS amount_total,
       'cust' || o_custkey || '@example.com' AS first_email,
       'A' || o_orderkey AS first_invoice_no
FROM orders
"""

    # expected categorizer output for the three constructed templates —
    # constants derived from the verified-parity scorer (see tests)
    oracles["categorize_orders_docs"] = """
WITH buckets AS (
  SELECT CASE WHEN o_orderkey % 3 = 0 THEN 'invoice'
              WHEN o_orderkey % 3 = 1 THEN 'receipt'
              ELSE 'unknown' END AS category,
         CASE WHEN o_orderkey % 3 = 0 THEN 1.0
              WHEN o_orderkey % 3 = 1 THEN 1.0
              ELSE 0.0 END AS conf
  FROM orders
)
SELECT category, count(*) AS n_docs, round(avg(conf), 6) AS avg_conf
FROM buckets GROUP BY category
"""

    # LSH recall invariants: identical text ⇒ identical signature ⇒ the
    # pair is always recovered, so recall over exact-dup truth is 100 %.
    _recall = """
WITH d AS (
  SELECT doc_id, md5(text) AS h FROM documents
  UNION ALL
  SELECT doc_id + 1000000, md5(text) FROM documents
), truth AS (
  SELECT l.doc_id AS a, r.doc_id AS b
  FROM d l JOIN d r ON l.h = r.h AND l.doc_id < r.doc_id
)
SELECT count(*) AS n_true_pairs, count(*) AS n_recovered FROM truth
"""
    oracles["minhash_recall"] = _recall
    oracles["simhash_recall"] = _recall

    # full SQL rerun of operators/dedup.py::dedup_lines over the same
    # composed multi-line pages (shared header / body / unique footer):
    # a line in >1 distinct docs is removed everywhere, order preserved,
    # lines under 5 trimmed chars always kept
    oracles["line_dedup_clean"] = """
WITH d AS (
  SELECT doc_id,
         'SHARED HEADER BOILERPLATE LINE' || chr(10) || text || chr(10)
           || 'unique footer ' || doc_id AS text
  FROM documents WHERE doc_id < 150 AND text IS NOT NULL
), l AS (
  SELECT doc_id, lines[i] AS line, i AS ord
  FROM (SELECT doc_id, string_split(text, chr(10)) AS lines FROM d) t,
       LATERAL unnest(generate_series(1, len(lines))) AS g(i)
), f AS (
  SELECT line FROM l WHERE len(trim(line)) >= 5
  GROUP BY line HAVING count(DISTINCT doc_id) > 1
), k AS (
  SELECT doc_id, line, ord FROM l
  WHERE line NOT IN (SELECT line FROM f)
), r AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY ord) AS clean_text
  FROM k GROUP BY doc_id
)
SELECT d.doc_id, md5(coalesce(r.clean_text, '')) AS clean_md5,
       CAST(len(coalesce(r.clean_text, '')) AS BIGINT) AS clean_chars
FROM d LEFT JOIN r USING (doc_id)
"""

    # stratified sampling: same md5-of-id order, QUALIFY top-3 per source
    oracles["doc_stratified_sample"] = """
SELECT doc_id, source FROM documents
QUALIFY row_number() OVER (
  PARTITION BY source
  ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)) <= 3
"""

    # repetition metrics recomputed from scratch over the same composed
    # multi-line pages
    oracles["doc_repetition_stats"] = """
WITH d AS (
  SELECT doc_id,
         text || chr(10) || text || chr(10) || 'tail tail tail '
           || doc_id AS t
  FROM documents WHERE doc_id < 200 AND text IS NOT NULL
), l AS (
  SELECT doc_id, u.line
  FROM d, LATERAL unnest(string_split(t, chr(10))) AS u(line)
), pl AS (
  SELECT doc_id, count(*) AS c, len(line) * count(*) AS chars
  FROM l GROUP BY doc_id, line
), ls AS (
  SELECT doc_id,
         sum(CASE WHEN c > 1 THEN chars ELSE 0 END)::DOUBLE
           / greatest(sum(chars), 1) AS dup_line_frac
  FROM pl GROUP BY doc_id
), tok AS (
  SELECT doc_id,
         CASE WHEN trim(t) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(lower(t)), '\\s+')
         END AS toks
  FROM d
), bg AS (
  SELECT doc_id, u.g
  FROM (SELECT doc_id, list_transform(
          generate_series(1, greatest(len(toks) - 1, 0)),
          i -> toks[i] || ' ' || toks[i+1]) AS grams FROM tok) g0,
       LATERAL unnest(grams) AS u(g)
), pg AS (
  SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g
), gs AS (
  SELECT doc_id, max(c)::DOUBLE / sum(c) AS top_bigram_frac
  FROM pg GROUP BY doc_id
)
SELECT d.doc_id,
       round(coalesce(ls.dup_line_frac, 0), 6) AS dup_line_frac,
       round(coalesce(gs.top_bigram_frac, 0), 6) AS top_bigram_frac
FROM d LEFT JOIN ls USING (doc_id) LEFT JOIN gs USING (doc_id)
"""

    # connected components on decade chains: component = floor-decade
    oracles["dup_components"] = """
WITH nodes AS (
  SELECT doc_id AS node FROM documents WHERE doc_id < 300
    AND doc_id % 10 < 3
  UNION
  SELECT doc_id + 1 FROM documents WHERE doc_id < 300
    AND doc_id % 10 < 3
)
SELECT node, node - (node % 10) AS component FROM nodes
"""

    # image near-dup: identical PNG ⇒ identical dHash ⇒ Hamming-0 pair
    oracles["image_near_dup_recall"] = """
SELECT count(*) AS n_true_pairs, count(*) AS n_recovered
FROM documents WHERE doc_id < 100
"""

    # decontamination: shared word 8-grams vs a benchmark slice,
    # recomputed from scratch with list_intersect
    oracles["benchmark_contamination"] = f"""
WITH t AS (
  SELECT doc_id, {_TOKENIZE_LOWER} AS toks
  FROM documents WHERE doc_id < 300
), c AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(len(toks) - 7, 0)),
    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
         || toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5] || ' '
         || toks[i+6] || ' ' || toks[i+7])) AS grams
  FROM t
), b AS (
  SELECT list_distinct(flatten(list(grams))) AS bgrams
  FROM c WHERE doc_id % 97 = 0
)
SELECT doc_id,
       CAST(len(list_intersect(grams, bgrams))
            AS BIGINT) AS n_contaminated_grams
FROM c CROSS JOIN b
WHERE len(list_intersect(grams, bgrams)) > 0
"""

    # incremental dedup: every re-crawled copy collides with its index
    # row (identical signature ⇒ identical band keys) and is dropped
    oracles["minhash_incremental_recall"] = """
SELECT count(*) AS n_new, count(*) AS n_dropped,
       CAST(0 AS BIGINT) AS n_unique
FROM documents
"""

    # ANN recall invariants: a self-query's identical corpus copy is a
    # guaranteed candidate (same buckets in every LSH table / same
    # nearest IVF centroid), so every query retrieves a cosine-1.0 hit.
    _ann_recall = """
SELECT count(*) AS n_queries, count(*) AS n_perfect
FROM embeddings WHERE vec_id < 50
"""
    oracles["knn_lsh_recall"] = _ann_recall
    oracles["knn_ivf_recall"] = _ann_recall

    # identical vector ⇒ identical sign bucket in every table ⇒ each
    # doubled pair (i, i+SHIFT) always collides; recall is 100 %.
    oracles["embedding_near_dup_recall"] = """
SELECT count(*) AS n_true_pairs, count(*) AS n_recovered FROM embeddings
"""

    # full-pipeline showcase: the 300-row corpus is seed-deterministic
    # (corpus.py), so its status/source/category counts are a constant —
    # pinned here as a frozen golden (same mechanism as
    # tests/goldens/corpus_goldens.json; regenerate deliberately by
    # re-running the query and updating these literals).  This turns the
    # end-to-end extraction path into a driver-gated regression check.
    oracles["corpus_extract_stats"] = """
SELECT * FROM (VALUES
  ('done', 'html', 'contract', CAST(21 AS BIGINT)),
  ('done', 'html', 'invoice', 105),
  ('done', 'html', 'letter', 21),
  ('done', 'html', 'receipt', 30),
  ('done', 'html', 'unknown', 56),
  ('done', 'native_pdf', 'unknown', 18),
  ('done', 'precomputed', 'invoice', 30),
  ('failed_permanent', 'error', NULL, 19)
) AS t(status, source, category, n_docs)
"""

    # JPEG flat-color exact round-trip: DC quantization error at q85 is
    # < 0.5/pixel, so decode reproduces the constant exactly
    oracles["jpeg_flat_roundtrip"] = """
SELECT doc_id, 'ok' AS decode_status,
       CAST(24 AS INT) AS width, CAST(16 AS INT) AS height,
       CAST((doc_id * 13) % 256 AS DOUBLE) AS brightness,
       0.0 AS contrast
FROM documents WHERE doc_id < 200
"""

    # WAV audio path: DC-signal fixtures make every statistic exactly
    # recomputable (int16 quantization = floor(a*32767)/32768)
    oracles["wav_audio_stats"] = """
WITH d AS (
  SELECT doc_id,
         ((doc_id % 16) + 1) / 20.0 AS a,
         1000 + doc_id % 50 AS n
  FROM documents WHERE doc_id < 200
)
SELECT doc_id, 'ok' AS decode_status,
       CAST(n AS INT) AS n_samples,
       CAST((n * 1000) // 8000 AS DOUBLE) AS duration_ms,
       round(floor(a * 32767) / 32768, 9) AS mean_amplitude
FROM d
"""

    # thumbnail size contract (app/thumbnail_generator.py:155-188): no
    # upscale; landscape pins width, portrait/square pins height;
    # int-truncated free side clamped to >= 1
    oracles["thumbnail_dims"] = """
WITH d AS (
  SELECT doc_id,
         16 + (doc_id % 50) * 7 AS ow,
         16 + ((doc_id * 3) % 40) * 5 AS oh
  FROM documents WHERE doc_id < 200
)
SELECT doc_id, 'ok' AS status,
       CAST(ow AS INT) AS original_width,
       CAST(oh AS INT) AS original_height,
       CAST(CASE WHEN ow <= 128 AND oh <= 128 THEN ow
                 WHEN ow > oh THEN 128
                 ELSE greatest(CAST(floor(
                   128 * (ow::DOUBLE / oh::DOUBLE)) AS INT), 1)
            END AS INT) AS width,
       CAST(CASE WHEN ow <= 128 AND oh <= 128 THEN oh
                 WHEN ow > oh THEN greatest(CAST(floor(
                   128 / (ow::DOUBLE / oh::DOUBLE)) AS INT), 1)
                 ELSE 128
            END AS INT) AS height
FROM d
"""

    # WARC round-trip: encode→parse must preserve every record, so both
    # counters equal the slice's row count.
    oracles["warc_roundtrip_stats"] = """
SELECT count(*) AS n_records, count(*) AS n_match
FROM documents WHERE doc_id < 200
"""

    # the fake-decode plumbing is a pure function of the text payload:
    # row count, distinct blake2b digests (collision-free ⇒ distinct
    # texts), total UTF-8 bytes — all recomputable in SQL.
    oracles["media_feature_stats"] = """
SELECT count(*) AS n_media,
       count(DISTINCT text) AS n_distinct,
       CAST(sum(strlen(text)) AS BIGINT) AS total_bytes
FROM documents
"""

    # exact 3-gram Jaccard recomputed from scratch in SQL
    oracles["ngram_jaccard_dups"] = r"""
WITH g AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(toks) - 2, 0)),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
           AS grams
  FROM (SELECT doc_id,
               CASE WHEN text IS NULL OR trim(text) = ''
                    THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(lower(text)), '\s+')
               END AS toks
        FROM documents WHERE doc_id < 250) t
), pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) > 0
              THEN CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.grams, b.grams)))
              ELSE 0.0 END AS j
  FROM g a JOIN g b ON a.doc_id < b.doc_id
)
SELECT a, b, round(j, 6) AS jaccard FROM pairs WHERE j >= 0.15
"""

    # analytic twin of the real PNG encode→decode→stats path: the Spark
    # side decodes actual PNG bytes; the oracle recomputes the metrics
    # from the pixel formula.  Exact-arithmetic forms (power-of-two
    # divisors, integer sums) so both sides produce bit-identical
    # doubles before rounding.
    oracles["png_pixel_stats"] = """
WITH px AS (
  SELECT d.doc_id, (d.doc_id * 7 + k.k * k.k) % 256 AS v
  FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
  CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS k) k
)
SELECT doc_id,
       'ok' AS decode_status,
       CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
       round(sum(v)::DOUBLE / 256, 6) AS brightness,
       round(sqrt(sum(v*v)::DOUBLE / 256
                  - (sum(v)::DOUBLE / 256) * (sum(v)::DOUBLE / 256)), 6)
         AS contrast
FROM px GROUP BY doc_id
"""

    oracles["knn_bruteforce"] = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe
           FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
s AS (SELECT query_id, c.vec_id,
             list_cosine_similarity(qe, c.embedding) AS score
      FROM q CROSS JOIN c)
SELECT query_id, vec_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, vec_id ASC) AS INT)
         AS rank
FROM s
QUALIFY rank <= 5
"""

    oracles["embedding_centroids"] = """
SELECT label, CAST(i AS INT) AS pos,
       round(avg(embedding[CAST(i + 1 AS INT)]), 4) AS centroid_v
FROM embeddings, range(0, 64) t(i)
GROUP BY label, i
"""

    return oracles
