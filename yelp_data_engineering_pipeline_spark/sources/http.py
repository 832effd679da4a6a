"""Stage-1 acquisition as Spark dataflow (SURVEY.md §2.1 S3-S6, §2.11
UD1, §3 E1; reference web_scraper/web_scraping.py).

The reference fans out HTTP fetches with asyncio coroutines
(web_scraping.py:194-209,435-450). The Spark-native shape moves the
data plane onto executors:

    page-offset DataFrame → mapInPandas(fetch) → JVM-side regex parse
    worklist DataFrame → anti-join(done) → mapInPandas(fetch+parse)

The fetcher is **pluggable** (a ``Callable[[str], str | None]``): tests
inject a deterministic synthetic fetcher; a production deployment
injects an HTTP client (requests/urllib inside the executor task —
bounded per-partition concurrency replaces the reference's
``asyncio.Semaphore(20)``, ST3). Retries with backoff (ST4,
web_scraping.py:28-48) wrap each call *inside* the task so one bad URL
doesn't fail the partition.

Search-result parsing (F1, web_scraping.py:84-120) happens JVM-side via
regexp_extract_all — Python touches only the raw fetched text. The
business-page parse (UD1, web_scraping.py:250-368) is the one genuine
Python-UDF surface in the engine: HTML/embedded-JSON surgery
(S6 apollo-state extraction: strip the script tag, html.unescape, trim
4 leading / 3 trailing chars, json.loads — web_scraping.py:283-293)
done with stdlib inside mapInPandas, Arrow-batched.

Scale notes: fetch partitions are sized by ``repartition(n_tasks)`` so
the HTTP fan-out is (partitions × in-task loop); no driver-side
collect anywhere; the anti-join resume (ST1/J4, web_scraping.py:517-521)
broadcasts the done-set when small and shuffles both sides otherwise.
"""

from __future__ import annotations

import html as html_mod
import html.parser as html_parser
import json
import re
import time
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..functions.strings import normalize_business_url
from ..schemas import BUSINESS_LIST_SCHEMA, RESULTS_SCHEMA

Fetcher = Callable[[str], str | None]

# One regex, five groups — same extraction contract as the reference's
# search-snippet parse (web_scraping.py:94-110).
_SEARCH_ROW_RE = (
    r'\{"bizId": "([^"]+)", "ranking": (\d+), "isAd": (true|false), '
    r'"name": "([^"]+)", "businessUrl": "([^"]+)"\}'
)

_SENTINEL = "excessivePaging"


def retrying(
    fetcher: Fetcher,
    attempts: int = 5,
    backoff: Callable[[int], float] | None = None,
    on_exhausted: str = "raise",
) -> Fetcher:
    """ST4: bounded retries with injectable backoff (the reference
    sleeps random 2-8 s; tests inject a zero backoff).

    ``on_exhausted``: ``"raise"`` fails the task (Spark then applies
    task-level retries); ``"skip"`` returns None so the per-row skip
    paths downstream (scrape_businesses' ``if page is None: continue``)
    drop the record WITHOUT failing the partition — the reference's
    error-skip behavior (web_scraping.py:213-215, 344-347)."""
    if on_exhausted not in ("raise", "skip"):
        raise ValueError(f"on_exhausted must be raise|skip, got {on_exhausted!r}")

    def fetch(url: str) -> str | None:
        last: Exception | None = None
        for i in range(attempts):
            try:
                return fetcher(url)
            except Exception as e:  # noqa: BLE001 - retry any fetch error
                last = e
                if backoff is not None:
                    time.sleep(backoff(i))
        if on_exhausted == "skip":
            return None
        raise RuntimeError(f"fetch failed after {attempts} attempts: {url}") from last

    return fetch


def http_fetcher(base_url: str, timeout_s: float = 10.0) -> Fetcher:
    """Real-HTTP fetcher (stdlib urllib): GET ``base_url + path``,
    decode utf-8. HTTP >= 400 and socket timeouts RAISE, feeding the
    :func:`retrying` policy exactly like the reference's
    ``raise_for_status`` (web_scraping.py:139,158; timeouts :475,66).
    Picklable: executors open their own connections per call."""

    def fetch(path: str) -> str | None:
        import urllib.request

        with urllib.request.urlopen(base_url + path, timeout=timeout_s) as resp:
            return resp.read().decode("utf-8")

    return fetch


RAW_PAGE_SCHEMA = StructType(
    [StructField("start", StringType(), False), StructField("page_text", StringType(), True)]
)


def fetch_search_pages(
    spark: SparkSession, fetcher: Fetcher, starts: list[int], n_tasks: int = 8
) -> DataFrame:
    """S3: fetch a batch of search pages as (start, raw text) rows."""
    offsets = spark.createDataFrame([(str(s),) for s in starts], ["start"]).repartition(n_tasks)

    def fetch_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            texts = [fetcher(f"/search/snippet?start={s}") for s in pdf["start"]]
            yield pd.DataFrame({"start": pdf["start"], "page_text": texts})

    return offsets.mapInPandas(fetch_batch, RAW_PAGE_SCHEMA)


def parse_search_pages(raw: DataFrame) -> DataFrame:
    """F1 + P1/P2/P4: JVM-side multi-group regex extraction, ad filter,
    URL normalization — returns BUSINESS_LIST_SCHEMA-shaped rows."""
    groups = {
        "bizId": 1,
        "ranking": 2,
        "isAd": 3,
        "name": 4,
        "businessUrl": 5,
    }
    arrays = [
        F.regexp_extract_all(F.col("page_text"), F.lit(_SEARCH_ROW_RE), g).alias(name)
        for name, g in groups.items()
    ]
    zipped = F.arrays_zip(*[F.col(n) for n in groups])
    return (
        raw.filter(~F.col("page_text").contains(_SENTINEL))
        .select(*arrays)
        .select(F.explode(zipped).alias("r"))
        .select(
            F.col("r.bizId").alias("bizId"),
            F.col("r.ranking").cast("int").alias("ranking"),
            (F.col("r.isAd") == "true").alias("isAd"),
            F.col("r.name").alias("name"),
            normalize_business_url(F.col("r.businessUrl")).alias("businessUrl"),
        )
        .filter(~F.col("isAd"))  # P1: drop advertisements
        .drop("isAd")  # P2
    )


def scrape_search_pages(
    spark: SparkSession,
    fetcher: Fetcher,
    *,
    batch_size: int = 10,
    page_size: int = 10,
    max_batches: int = 100,
) -> DataFrame:
    """E1 phase 1: micro-batched cursor advance with sentinel stop
    (ST2, web_scraping.py:190-229). Each batch is one Spark job; the
    cursor loop stays on the driver exactly like the reference's."""
    out: DataFrame | None = None
    start = 0
    for _ in range(max_batches):
        starts = [start + i * page_size for i in range(batch_size)]
        # Eager localCheckpoint (not cache): materializes the fetch ONCE
        # and truncates lineage, so neither the sentinel count, the
        # parse, nor a later cache eviction can re-invoke the HTTP
        # fetcher, and the union over many batches stays shallow
        # (ADVICE.md r1: cached plans leaked storage and risked
        # re-fetch on eviction). Blocks are freed by the ContextCleaner
        # once the returned frame is materialized and dropped.
        raw = fetch_search_pages(spark, fetcher, starts).localCheckpoint(eager=True)
        hit_sentinel = raw.filter(
            F.col("page_text").contains(_SENTINEL) | F.col("page_text").isNull()
        ).count()
        parsed = parse_search_pages(raw)
        out = parsed if out is None else out.unionByName(parsed)
        if hit_sentinel > 0:
            break
        start += batch_size * page_size
    assert out is not None
    return out


# ---------------------------------------------------------------------------
# Stage-1b: business pages
# ---------------------------------------------------------------------------


def extract_apollo_state(page_html: str) -> dict | None:
    """S6 (web_scraping.py:283-293): locate the apollo-state script tag,
    unescape HTML entities, strip 4 leading / 3 trailing chars,
    json.loads. stdlib only — no bs4 dependency."""
    m = re.search(
        r'<script[^>]*data-apollo-state[^>]*>(.*?)</script>', page_html, re.DOTALL
    )
    if not m:
        return None
    blob = html_mod.unescape(m.group(1))
    blob = blob[4:-3]
    try:
        return json.loads(blob)
    except (ValueError, TypeError):
        return None


class _HoursTableParser(html_parser.HTMLParser):
    """Minimal stdlib extractor for the first ``<table class="hours-table_*">``
    (no lxml/bs4 in the runtime). Collects rows of whitespace-normalized
    cell texts."""

    def __init__(self) -> None:
        super().__init__()
        self._in_table = False
        self._depth = 0
        self._in_cell = False
        self._cell: list[str] = []
        self._row: list[str] = []
        self.rows: list[list[str]] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "table":
            if self._in_table:
                self._depth += 1
            elif "hours-table" in (dict(attrs).get("class") or ""):
                self._in_table = True
                self._depth = 1
        elif self._in_table and tag == "tr":
            self._row = []
        elif self._in_table and tag in ("td", "th"):
            self._in_cell = True
            self._cell = []

    def handle_endtag(self, tag: str) -> None:
        if tag == "table" and self._in_table:
            self._depth -= 1
            if self._depth == 0:
                self._in_table = False
        elif self._in_table and tag in ("td", "th") and self._in_cell:
            self._in_cell = False
            self._row.append(" ".join("".join(self._cell).split()))
        elif self._in_table and tag == "tr" and self._row:
            self.rows.append(self._row)

    def handle_data(self, data: str) -> None:
        if self._in_cell:
            self._cell.append(data)


def parse_hours_table(page_html: str | None) -> list[dict[str, str]] | None:
    """S5 + P6 (reference web_scraper/web_scraping.py:264-280): literal
    HTML hours-table scan — the reference ``pd.read_html``s the
    ``hours-table_*`` table and positionally slices/renames columns
    [0]=weekday, [1]=hours. Used as the FALLBACK when the apollo-state
    blob is missing or truncated but the rendered table survived
    (VERDICT.md r1 "What's missing" #2); the apollo-state path stays
    authoritative because both render from the same data."""
    if not page_html or "hours-table" not in page_html:
        return None
    p = _HoursTableParser()
    try:
        p.feed(page_html)
        p.close()
    except Exception:
        return None
    rows = [r for r in p.rows if len(r) >= 2]
    # drop a header row ("Day | Hours") if present — the positional
    # slice in the reference does the same implicitly via read_html
    if rows and rows[0][0].strip().lower() in ("day", "weekday", "mon - sun"):
        rows = rows[1:]
    out = [{"weekday": r[0], "open_hours": r[1]} for r in rows]
    return out or None


def _business_info_from_state(
    state: dict, props: dict | None, hours_fallback: list[dict[str, str]] | None = None
) -> dict[str, Any] | None:
    """UD1 (web_scraping.py:250-368): assemble the BusinessInfo struct
    from the embedded apollo-state + /props JSON; ``hours_fallback``
    (from :func:`parse_hours_table`) fills in when the blob lost its
    openHours."""
    if not state or "business" not in state:
        return None
    b = state["business"]
    open_hours = [
        {"weekday": h.get("weekday"), "open_hours": h.get("hours")}
        for h in b.get("openHours", [])
    ]
    if not open_hours and hours_fallback:
        open_hours = [
            {"weekday": h["weekday"], "open_hours": h["open_hours"]}
            for h in hours_fallback
        ]
    info = {
        "name": b.get("name"),
        "website": b.get("website"),
        "phone_number": b.get("phone"),
        "address": b.get("address"),
        "price": b.get("price"),
        "health_score": b.get("healthScore"),
        "open_hours": open_hours,
        "food_category": list(b.get("categories", [])),
        "amenities": [
            {"amenity": a.get("name"), "is_available": bool(a.get("available"))}
            for a in b.get("amenities", [])
        ],
        "highlights": list((props or {}).get("highlights", [])),
        "related_search_terms": list((props or {}).get("relatedSearches", [])),
    }
    if info["name"] is None:
        return None
    return info


def scrape_businesses(
    worklist: DataFrame,
    fetcher: Fetcher,
    already_scraped: DataFrame | None = None,
    n_tasks: int = 8,
) -> DataFrame:
    """E1 phase 2: anti-join resume (ST1/J4) then per-row fetch+parse in
    mapInPandas; output rows follow RESULTS_SCHEMA."""
    todo = worklist
    if already_scraped is not None:
        todo = worklist.join(
            already_scraped.select("bizId").distinct(), "bizId", "left_anti"
        )
    todo = todo.repartition(n_tasks)

    result_fields = [f.name for f in RESULTS_SCHEMA.fields]

    def fetch_parse(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                page = fetcher(rec["businessUrl"])
                props_text = fetcher(f"/biz/{rec['bizId']}/props")
                if page is None:
                    continue
                state = extract_apollo_state(page)
                props = None
                if props_text:
                    try:
                        props = json.loads(props_text)
                    except ValueError:
                        props = None
                info = _business_info_from_state(
                    state or {}, props, hours_fallback=parse_hours_table(page)
                )
                if info is None:
                    continue
                # J7: merge the worklist keys with the parsed struct
                # (web_scraping.py:407-408)
                rows.append({"bizId": rec["bizId"], "ranking": rec["ranking"], **info})
            yield pd.DataFrame(rows, columns=result_fields)

    return todo.mapInPandas(fetch_parse, RESULTS_SCHEMA)


__all__ = [
    "BUSINESS_LIST_SCHEMA",
    "Fetcher",
    "extract_apollo_state",
    "fetch_search_pages",
    "http_fetcher",
    "parse_hours_table",
    "parse_search_pages",
    "retrying",
    "scrape_businesses",
    "scrape_search_pages",
]
