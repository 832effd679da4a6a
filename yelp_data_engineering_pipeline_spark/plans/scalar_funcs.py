"""Scalar-function catalog (SURVEY.md §2.7): regex, time, string, URL,
JSON, casts, hashing — each as a small deterministic query with a DuckDB
oracle.

All of these stay JVM-side (built-in ``pyspark.sql.functions``, inside
whole-stage codegen) — no Python UDFs in any hot path. The only UDF the
engine keeps is the HTML-page parser (SURVEY §2.11 UD1), which lives in
sources/http.py behind mapInPandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.strings import html_unescape
from ..tables import load
from .catalog import register


# --- F1/F2: regexp extract-all, multi-group (web_scraping.py:94-110;
# parse_and_upload_to_db.py:76) ------------------------------------------------
def func_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load(spark, sf_dir, "documents")
    words = F.regexp_extract_all(F.col("text"), F.lit(r"\b(s\w+)\b"), 1)
    return doc.select(
        "doc_id",
        F.size(words).alias("n_s_words"),
        F.try_element_at(words, F.lit(1)).alias("first_s_word"),
    )


register(
    "func_regexp_extract_all",
    func_regexp_extract_all,
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\b(s\w+)\b', 1)) AS INT) AS n_s_words,
           regexp_extract_all(text, '\b(s\w+)\b', 1)[1] AS first_s_word
    FROM documents
    """,
)


# --- F4: 12-hour time parse with fallback (parse_and_upload_to_db.py:50-55) ----
# Spark builds an "h:mm a" string and parses it back → seconds-of-day;
# the oracle computes seconds-of-day directly (same answer, exercises
# the parse path in Spark). The fallback coalesce mirrors the
# reference's "%I:%M %p" → "%I %p" retry. The string is BUILT from the
# tz-free epoch (not date_format, which renders in session tz); the
# parse→extract round trip itself is tz-invariant for tz-free strings.
def func_time_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    h24 = F.expr("(unix_micros(ts) div 1000000 % 86400) div 3600")
    mins = F.expr("(unix_micros(ts) div 1000000 % 3600) div 60")
    h12 = ((h24 + 11) % 12) + 1
    ampm = F.when(h24 < 12, F.lit("AM")).otherwise(F.lit("PM"))
    s = F.format_string("%d:%02d %s", h12, mins, ampm)
    parsed = F.coalesce(F.try_to_timestamp(s, F.lit("h:mm a")), F.try_to_timestamp(s, F.lit("h a")))
    secs = (F.hour(parsed) * 3600 + F.minute(parsed) * 60 + F.second(parsed)).cast("int")
    return ev.select("event_id", secs.alias("secs_of_day"))


register(
    "func_time_parse",
    func_time_parse,
    """
    SELECT event_id,
           CAST(hour(ts) * 3600 + minute(ts) * 60 AS INT) AS secs_of_day
    FROM events
    """,
)


# --- F5: special-value mapping via CASE (parse_and_upload_to_db.py:70-74) ------
def func_case_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "purchase", F.lit("rev"))
        .when(F.col("event_type").isin("click", "view"), F.lit("engagement"))
        .when(F.col("event_type") == "error", F.lit("bad"))
        .otherwise(F.lit("other"))
    )
    return ev.groupBy(code.alias("code")).agg(F.count(F.lit(1)).alias("n"))


register(
    "func_case_mapping",
    func_case_mapping,
    """
    SELECT CASE WHEN event_type = 'purchase' THEN 'rev'
                WHEN event_type IN ('click', 'view') THEN 'engagement'
                WHEN event_type = 'error' THEN 'bad'
                ELSE 'other' END AS code,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    """,
)


# --- F6: weekday name (app.py:151) ---------------------------------------------
def func_weekday_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_format("o_orderdate", "E").alias("weekday"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


register(
    "func_weekday_name",
    func_weekday_name,
    """
    SELECT strftime(o_orderdate, '%a') AS weekday, COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1
    """,
)


# --- F8-shape: interval arithmetic / date diff (app.py:217-226) ------------------
def func_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("ship_delay_days"),
            F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        )
    )


register(
    "func_interval_arith",
    func_interval_arith,
    """
    SELECT l_orderkey, l_linenumber,
           CAST(date_diff('day', o_orderdate, l_shipdate) AS INT) AS ship_delay_days,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)


# --- F9/F10: trim/replace/substring_index/split (web_scraping.py:114,359-360) ----
def func_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.substring_index("p_name", " ", 1).alias("first_word"),
        F.regexp_replace("p_name", " ", "_").alias("snake_name"),
        F.trim(F.upper("p_brand")).alias("brand_uc"),
        F.substring("p_type", 1, 3).alias("type_prefix"),
    )


register(
    "func_string_ops",
    func_string_ops,
    """
    SELECT p_partkey,
           split_part(p_name, ' ', 1) AS first_word,
           replace(p_name, ' ', '_') AS snake_name,
           trim(upper(p_brand)) AS brand_uc,
           substring(p_type, 1, 3) AS type_prefix
    FROM part
    """,
)


# --- F11: URL query-param extraction (web_scraping.py:260-261) -------------------
def func_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://www.yelp.com/redirect?url=https%3A%2F%2Fsite%2F"),
        F.col("source"),
        F.lit("&ref="),
        F.col("doc_id"),
    )
    return doc.select(
        "doc_id",
        F.parse_url(url, F.lit("QUERY"), F.lit("url")).alias("target"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
    )


register(
    "func_url_parse",
    func_url_parse,
    """
    SELECT doc_id,
           'https%3A%2F%2Fsite%2F' || source AS target,
           'www.yelp.com' AS host
    FROM documents
    """,
)


# --- F12: HTML unescape (web_scraping.py:292) — chained-replace built-ins ---------
def func_html_unescape(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load(spark, sf_dir, "documents")
    escaped = F.concat(F.lit("&lt;p&gt; &amp;quot;"), F.col("source"), F.lit("&quot; &amp;amp; &#39;x&#39;"))
    return doc.select("doc_id", html_unescape(escaped).alias("unescaped"))


register(
    "func_html_unescape",
    func_html_unescape,
    """
    SELECT doc_id,
           '<p> &quot;' || source || '" &amp; ''x''' AS unescaped
    FROM documents
    """,
)


# --- F13: JSON extraction, both path and schema-on-read (web_scraping.py:292) -----
def func_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k_path = F.get_json_object("props", "$.k").cast("int")
    k_struct = F.from_json("props", "k INT").getField("k")
    return ev.select("event_id", k_path.alias("k"), k_struct.alias("k_struct"))


register(
    "func_json_extract",
    func_json_extract,
    """
    SELECT event_id,
           CAST(props ->> '$.k' AS INT) AS k,
           CAST(props ->> '$.k' AS INT) AS k_struct
    FROM events
    """,
)


# --- F15/F16/F17: casts, bool parse, digit test (web_scraping.py:106-107) ---------
def func_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k_str = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k_str.try_cast("int").alias("k_int"),
        (k_str.try_cast("int") % 2 == 0).alias("k_even"),
        k_str.rlike("^[0-9]+$").alias("k_isdigit"),
        F.col("value").cast("int").alias("value_int"),
    )


register(
    "func_casts",
    func_casts,
    """
    SELECT event_id,
           TRY_CAST(props ->> '$.k' AS INT) AS k_int,
           TRY_CAST(props ->> '$.k' AS INT) % 2 = 0 AS k_even,
           regexp_full_match(props ->> '$.k', '[0-9]+') AS k_isdigit,
           CAST(trunc(value) AS INT) AS value_int
    FROM events
    """,
)


# --- hashing: md5 fingerprint (shared by dedup; matches DuckDB bit-for-bit) -------
def func_hash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load(spark, sf_dir, "documents")
    return doc.select(
        "doc_id",
        F.md5(F.col("text")).alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.length(F.col("text")).alias("text_len"),
    )


register(
    "func_hash_md5",
    func_hash_md5,
    """
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           CAST(length(text) AS INT) AS text_len
    FROM documents
    """,
)
