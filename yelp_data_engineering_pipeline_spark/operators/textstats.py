"""Text-analysis operators (extension, BASELINE.json): token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All are narrow per-row transformations (no shuffle at all until an
optional aggregate) built from JVM higher-order/regex functions — the
shape that scales linearly with input splits at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cache import tracked_persist
from ..plans.catalog import register
from ..partitioning import widen_for_compute
from ..tables import load

# BPE-ish tokenizer: letter runs, digit runs, single punctuation.
_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\x0b\f\r]"

_STOPWORDS = ["the", "a", "of", "and", "in", "to", "is"]

# Marker vocabularies for the n-gram/stopword language heuristic. The
# synthetic corpus is English-ish for every `lang`; the heuristic is
# still a faithful implementation of marker-based lang-ID.
_LANG_MARKERS = {
    "en": ["the", "a", "and", "of"],
    "es": ["el", "la", "de", "que"],
    "fr": ["le", "la", "et", "les"],
    "de": ["der", "die", "und", "das"],
}


def tokens(text: Column) -> Column:
    return F.regexp_extract_all(text, F.lit(_TOKEN_RE), 0)


def whitespace_tokens(text: Column) -> Column:
    # Explicit class instead of \s: Java's \s is [ \t\n\x0b\f\r] but
    # DuckDB's RE2 \s EXCLUDES \x0b, so a document containing a vertical
    # tab would tokenize differently across engines (ADVICE r4). The
    # class below IS Java's \s, spelled engine-independently; every
    # DuckDB oracle uses the same class.
    return F.filter(F.split(text, r"[ \t\n\x0b\f\r]+"), lambda x: x != "")


def quality_features(text: Column) -> dict[str, Column]:
    ws = whitespace_tokens(text)
    n_tokens = F.size(ws)
    n_chars = F.length(text)
    n_stop = F.size(F.filter(ws, lambda x: F.lower(x).isin(*_STOPWORDS)))
    n_alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    # Ratios of exact ints are NOT rounded: IEEE double division of
    # identical integer operands is bit-identical across engines, while
    # rounding diverges when the true value sits on a rounding boundary
    # (Spark rounds the shortest decimal repr, DuckDB the raw double).
    avg_word_len = n_chars.cast("double") / F.nullif(n_tokens, F.lit(0))
    stop_ratio = n_stop.cast("double") / F.nullif(n_tokens, F.lit(0))
    alpha_ratio = n_alpha.cast("double") / F.nullif(n_chars, F.lit(0))
    return {
        "n_tokens": n_tokens.cast("int"),
        "avg_word_len": avg_word_len,
        "stop_ratio": stop_ratio,
        "alpha_ratio": alpha_ratio,
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish score: stopword presence + length sanity +
    alphabetic density (heuristics in the C4/Gopher tradition)."""
    f = quality_features(text)
    length_ok = F.when((f["n_tokens"] >= 5) & (f["n_tokens"] <= 10000), 1.0).otherwise(0.0)
    # Same-order double arithmetic on both engines — no rounding (see
    # quality_features note).
    return (
        0.4 * F.coalesce(f["stop_ratio"] * 4, F.lit(0.0))
        + 0.3 * length_ok
        + 0.3 * F.coalesce(f["alpha_ratio"], F.lit(0.0))
    )


def _marker_filter(markers: list[str]):
    # Unary-lambda factory (a default-arg lambda would be read by Spark
    # as a two-argument (element, index) lambda).
    return lambda x: F.lower(x).isin(*markers)


def lang_scores(text: Column) -> dict[str, Column]:
    ws = whitespace_tokens(text)
    return {
        lang: F.size(F.filter(ws, _marker_filter(markers)))
        for lang, markers in _LANG_MARKERS.items()
    }


def predict_lang(text: Column) -> Column:
    """argmax over marker hits with fixed precedence en>es>fr>de;
    'und' (undetermined) when no marker hits at all."""
    s = lang_scores(text)
    pred = (
        F.when((s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["de"]) & (s["en"] > 0), "en")
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["de"]) & (s["es"] > 0), "es")
        .when((s["fr"] >= s["de"]) & (s["fr"] > 0), "fr")
        .when(s["de"] > 0, "de")
        .otherwise("und")
    )
    return pred


_FP_MOD = 1_000_000_007


def rolling_fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over characters (base 31, mod 1e9+7) —
    the classic Rabin-Karp document fingerprint, computed with a
    fold over the character array (stays in codegen)."""
    chars = F.filter(F.split(text, ""), lambda x: x != "")
    return F.when(
        F.length(text) == 0, F.lit(0).cast("bigint")
    ).otherwise(
        F.aggregate(
            chars,
            F.lit(0).cast("bigint"),
            lambda acc, c: (acc * 31 + F.ascii(c)) % _FP_MOD,
        )
    )


# ---------------------------------------------------------------------------
# Catalog entries + DuckDB oracles
# ---------------------------------------------------------------------------


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = widen_for_compute(load(spark, sf_dir, "documents"))
    return doc.select(
        "doc_id",
        F.size(whitespace_tokens(F.col("text"))).cast("int").alias("n_ws_tokens"),
        F.size(tokens(F.col("text"))).cast("int").alias("n_bpe_tokens"),
    )


register(
    "text_token_count",
    text_token_count,
    rf"""
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x != '')) AS INT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\x0b\f\r]')) AS INT) AS n_bpe_tokens
    FROM documents
    """,
)


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = widen_for_compute(load(spark, sf_dir, "documents"))
    f = quality_features(F.col("text"))
    feats = doc.select(
        "doc_id",
        f["n_tokens"].alias("n_tokens"),
        f["avg_word_len"].alias("avg_word_len"),
        f["stop_ratio"].alias("stop_ratio"),
        f["alpha_ratio"].alias("alpha_ratio"),
    )
    # Build the score from the PROJECTED feature columns rather than
    # quality_score(text): lambda subtrees (split/stopword filter) are
    # exempt from codegen subexpression elimination, so scoring the raw
    # text would run every feature a second time (measured ~30% of the
    # query at sf0.1). Same trees after inlining → bit-identical values.
    length_ok = F.when((F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 10000), 1.0).otherwise(
        0.0
    )
    return feats.withColumn(
        "quality",
        0.4 * F.coalesce(F.col("stop_ratio") * 4, F.lit(0.0))
        + 0.3 * length_ok
        + 0.3 * F.coalesce(F.col("alpha_ratio"), F.lit(0.0)),
    )


_STOP_IN = ", ".join(f"'{w}'" for w in _STOPWORDS)

register(
    "text_quality",
    text_quality,
    rf"""
    WITH base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x != '') AS ws,
             length(text) AS n_chars,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha
      FROM documents
    ),
    feats AS (
      SELECT doc_id,
             CAST(len(ws) AS INT) AS n_tokens,
             CAST(n_chars AS DOUBLE) / nullif(len(ws), 0) AS avg_word_len,
             CAST(len(list_filter(ws, x -> lower(x) IN ({_STOP_IN}))) AS DOUBLE)
                   / nullif(len(ws), 0) AS stop_ratio,
             CAST(n_alpha AS DOUBLE) / nullif(n_chars, 0) AS alpha_ratio
      FROM base
    )
    SELECT doc_id, n_tokens, avg_word_len, stop_ratio, alpha_ratio,
           CAST(0.4 AS DOUBLE) * COALESCE(stop_ratio * 4, 0)
                 + CAST(0.3 AS DOUBLE) * (CASE WHEN n_tokens >= 5 AND n_tokens <= 10000 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
                 + CAST(0.3 AS DOUBLE) * COALESCE(alpha_ratio, 0) AS quality
    FROM feats
    """,
)


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = widen_for_compute(load(spark, sf_dir, "documents"))
    s = lang_scores(F.col("text"))
    return doc.select(
        "doc_id",
        "lang",
        predict_lang(F.col("text")).alias("pred_lang"),
        s["en"].cast("int").alias("score_en"),
    )


def _markers_in(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])


register(
    "text_lang_id",
    text_lang_id,
    rf"""
    WITH scored AS (
      SELECT doc_id, lang,
             len(list_filter(ws, x -> lower(x) IN ({_markers_in('en')}))) AS s_en,
             len(list_filter(ws, x -> lower(x) IN ({_markers_in('es')}))) AS s_es,
             len(list_filter(ws, x -> lower(x) IN ({_markers_in('fr')}))) AS s_fr,
             len(list_filter(ws, x -> lower(x) IN ({_markers_in('de')}))) AS s_de
      FROM (SELECT doc_id, lang,
                   list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x != '') AS ws
            FROM documents)
    )
    SELECT doc_id, lang,
           CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en > 0 THEN 'en'
                WHEN s_es >= s_fr AND s_es >= s_de AND s_es > 0 THEN 'es'
                WHEN s_fr >= s_de AND s_fr > 0 THEN 'fr'
                WHEN s_de > 0 THEN 'de'
                ELSE 'und' END AS pred_lang,
           CAST(s_en AS INT) AS score_en
    FROM scored
    """,
)


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = widen_for_compute(load(spark, sf_dir, "documents"))
    return doc.select(
        "doc_id",
        rolling_fingerprint(F.col("text")).alias("fp"),
        F.md5("text").alias("fp_md5"),
    )


register(
    "text_fingerprint",
    text_fingerprint,
    f"""
    SELECT doc_id,
           CASE WHEN length(text) = 0 THEN 0
                ELSE list_reduce(
                       list_transform(list_filter(string_split(text, ''), c -> c != ''),
                                      c -> CAST(ascii(c) AS BIGINT)),
                       (acc, x) -> (acc * 31 + x) % {_FP_MOD})
           END AS fp,
           md5(text) AS fp_md5
    FROM documents
    """,
)


# --- composed training-data prep pipeline -------------------------------------
def pipeline_quality_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data prep as ONE declarative plan: token-count
    quality gate -> exact dedup (keep lowest doc_id per content hash) ->
    per-language corpus stats. Demonstrates that the extension operators
    compose without materialization barriers — Catalyst fuses the gate
    and the fingerprint into the scan projection, and the only shuffles
    are the dedup window and the final aggregate."""
    doc = widen_for_compute(load(spark, sf_dir, "documents"))
    feat = doc.select(
        "doc_id",
        "text",
        "lang",
        F.size(whitespace_tokens(F.col("text"))).cast("int").alias("n_tokens"),
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    kept = (
        feat.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter(F.col("n_tokens") >= 10)
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


register(
    "pipeline_quality_dedup",
    pipeline_quality_dedup,
    r"""
    WITH feat AS (
      SELECT doc_id, text, lang,
             CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x != '')) AS INT) AS n_tokens
      FROM documents
    ),
    kept AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS _rn
        FROM feat
      ) WHERE _rn = 1 AND n_tokens >= 10
    )
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM kept GROUP BY lang
    """,
)


def tfidf_topk(
    docs: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-``k`` most distinctive terms per document by tf-idf.

    idf is the RAW ratio n_docs/df (log-free): monotone in 1/df so the
    per-document ranking is preserved, and (tf*n_docs)/df is a single
    IEEE division of exact integers — bit-identical across engines,
    where log(x) would drift in the last ulp between libm builds.

    Scale shape: explode→two hash-aggs (term counts per doc, then doc
    freq per term) → broadcast 1-row corpus size → per-doc window.
    The window partitions by document (bounded by per-doc vocabulary),
    never globally. The df agg's key space is the corpus vocabulary —
    partial aggregation collapses it map-side.
    """
    d = widen_for_compute(docs)
    terms = d.select(
        F.col(id_col).alias("doc_id"),
        F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_docs = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    total = d.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_docs, "term")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "tfidf",
            (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df_docs"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "df_docs", "tfidf", "rk")
    )


def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_topk(load(spark, sf_dir, "documents"), "doc_id", "text")


register(
    "text_tfidf_topk",
    text_tfidf_topk,
    r"""
    WITH terms AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0b\f\r]+'), x -> x != '')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
    df_docs AS (SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY term),
    total AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term, tf, df_docs,
             CAST(tf * n_docs AS DOUBLE) / df_docs AS tfidf
      FROM tf JOIN df_docs USING (term) CROSS JOIN total
    )
    SELECT doc_id, term, tf, df_docs, tfidf, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
)


def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation: confusion matrix of the labeled ``lang``
    column vs the n-gram-marker prediction — the quality gate you read
    before trusting lang-id to route a 100 TB corpus. Bounded output
    (|langs|² rows), one hash-agg shuffle."""
    doc = widen_for_compute(load(spark, sf_dir, "documents"))
    return (
        doc.groupBy("lang", predict_lang(F.col("text")).alias("pred_lang"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


register(
    "text_lang_confusion",
    text_lang_confusion,
    rf"""
    WITH scored AS (
      SELECT doc_id, lang,
             len(list_filter(ws, x -> lower(x) IN ({_markers_in('en')}))) AS s_en,
             len(list_filter(ws, x -> lower(x) IN ({_markers_in('es')}))) AS s_es,
             len(list_filter(ws, x -> lower(x) IN ({_markers_in('fr')}))) AS s_fr,
             len(list_filter(ws, x -> lower(x) IN ({_markers_in('de')}))) AS s_de
      FROM (SELECT doc_id, lang,
                   list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x != '') AS ws
            FROM documents)
    ),
    pred AS (
      SELECT lang,
             CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en > 0 THEN 'en'
                  WHEN s_es >= s_fr AND s_es >= s_de AND s_es > 0 THEN 'es'
                  WHEN s_fr >= s_de AND s_fr > 0 THEN 'fr'
                  WHEN s_de > 0 THEN 'de'
                  ELSE 'und' END AS pred_lang
      FROM scored
    )
    SELECT lang, pred_lang, COUNT(*) AS n_docs FROM pred GROUP BY 1, 2
    """,
)


def canonical_text(text: Column) -> Column:
    """Formatting-insensitive canonical form: lowercase, strip
    punctuation, collapse whitespace runs, trim. The normalization
    applied BEFORE exact-hash dedup so "Hello,  World!" and "hello
    world" collapse — the cheap tier that removes most boilerplate
    duplication before any MinHash spend. Pure JVM regex chain (narrow,
    zero shuffle); identical regex classes run in the oracle."""
    c = F.lower(text)
    c = F.regexp_replace(c, "[^a-z0-9 ]", "")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = widen_for_compute(load(spark, sf_dir, "documents"))
    return (
        doc.groupBy(F.md5(canonical_text(F.col("text"))).alias("canon_fp"))
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


register(
    "dedup_canonical",
    dedup_canonical,
    """
    SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS canon_fp,
           MIN(doc_id) AS canonical_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)


# --- conjunctive boolean search (inverted-index shape) -----------------------
_SEARCH_TERMS = ("dup", "spark", "merge")  # 'dup' is the rare, selective term


def boolean_search(docs: DataFrame, terms: tuple[str, ...] = _SEARCH_TERMS) -> DataFrame:
    """Documents containing ALL query terms — the postings-intersection
    formulation: distinct (doc, term) postings filtered to the query
    vocabulary, then a count-equality set-containment check. No per-term
    joins, no cross products.

    Scale: the term filter happens INSIDE the explode projection (map
    side), so the shuffle carries only postings for query terms — at
    100 TB the rare term bounds the real work exactly like an inverted
    index probe; the agg is one doc-keyed hash shuffle.
    """
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    postings = (
        docs.select("doc_id", F.explode(words).alias("word"))
        .filter(F.col("word").isin(*terms))
        .distinct()
    )
    return (
        postings.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms"))
        .filter(F.col("n_terms") == len(terms))
        .select("doc_id")
        .orderBy("doc_id")
    )


def text_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return boolean_search(widen_for_compute(load(spark, sf_dir, "documents")))


register(
    "text_boolean_search",
    text_boolean_search,
    f"""
    WITH postings AS (
      SELECT DISTINCT doc_id, word
      FROM (SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
            FROM documents)
      WHERE word IN {_SEARCH_TERMS!r}
    )
    SELECT doc_id
    FROM postings
    GROUP BY doc_id
    HAVING COUNT(*) = {len(_SEARCH_TERMS)}
    ORDER BY doc_id
    """,
)


# --- bigram LM-coverage quality score ----------------------------------------
_COVER_MIN_COUNT = 75  # a bigram is "covered" if the corpus saw it ≥ this often


def lm_coverage(docs: DataFrame, min_count: int = _COVER_MIN_COUNT) -> DataFrame:
    """Per-document language-model-coverage score: the fraction of the
    doc's bigram INSTANCES whose corpus-wide bigram count is ≥
    ``min_count``. A log-free, integer-exact stand-in for n-gram-LM
    perplexity filtering (the CCNet/Gopher quality-gate shape): docs full
    of corpus-rare transitions score low.

    Scale: bigram explode is map-side; corpus counts are ONE content-
    keyed hash agg (map-side combined); the count join-back rides the
    same key; the per-doc rollup is one doc-keyed shuffle. The ratio is
    a single int/int division — bit-exact in any engine.
    """
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    base = docs.select("doc_id", words.alias("w")).filter(F.size("w") > 1)
    bi = base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 1),
                lambda i: F.concat_ws(" ", F.element_at("w", i), F.element_at("w", i + 1)),
            )
        ).alias("bg"),
    )
    counts = bi.groupBy("bg").agg(F.count(F.lit(1)).alias("_n"))
    return (
        bi.join(counts, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum((F.col("_n") >= min_count).cast("long")).alias("n_covered"),
            (
                F.sum((F.col("_n") >= min_count).cast("long")).cast("double")
                / F.count(F.lit(1))
            ).alias("coverage"),
        )
        .orderBy("doc_id")
    )


def text_lm_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lm_coverage(widen_for_compute(load(spark, sf_dir, "documents")))


register(
    "text_lm_coverage",
    text_lm_coverage,
    f"""
    WITH words AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM documents
    ),
    sched AS (
      SELECT doc_id, w, unnest(range(1, len(w))) AS i
      FROM words WHERE len(w) > 1
    ),
    bi AS (
      SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg FROM sched
    ),
    counts AS (
      SELECT bg, CAST(COUNT(*) AS BIGINT) AS n FROM bi GROUP BY bg
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN n >= {_COVER_MIN_COUNT} THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
           CAST(CAST(SUM(CASE WHEN n >= {_COVER_MIN_COUNT} THEN 1 ELSE 0 END) AS BIGINT)
                AS DOUBLE) / COUNT(*) AS coverage
    FROM bi JOIN counts USING (bg)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)


# --- BM25 retrieval scoring -------------------------------------------------

_BM25_TERMS = ("spark", "join", "filter")


def _eq_term(t: str):
    """Unary-lambda factory: a default-arg lambda (``lambda x, t=t:``)
    would be read by Spark's HOF binding as (element, index)."""
    return lambda x: x == F.lit(t)
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: tuple[str, ...] = _BM25_TERMS,
    k: int = _BM25_TOPK,
    k1: float = _BM25_K1,
    b: float = _BM25_B,
) -> DataFrame:
    """Top-``k`` documents for a fixed term query under BM25 scoring
    (Robertson-Spärck Jones probabilistic relevance family) — the
    retrieval primitive a training-data pipeline uses for targeted
    corpus slicing (and the lexical half of hybrid lexical+ANN search
    next to similarity.py's top-k tiers).

    Engine-parity design (the whole catalog's discipline applied to a
    scoring formula):
    - idf is the RAW RSJ ratio (n_docs - df + 0.5)/(df + 0.5), log-free
      like tfidf_topk above: ln() is not correctly-rounded IEEE and
      drifts between libm builds, while this ratio is monotone in the
      classic idf so per-term weight ORDERING is preserved;
    - the per-term weights are summed in FIXED left-to-right literal
      order (w_t1 + w_t2 + w_t3), never via a SUM() over exploded
      terms whose accumulation order the engine may choose;
    - every intermediate is either exact-int arithmetic or an IEEE op
      sequence written identically in the DuckDB oracle.

    Scale shape: one map-side pass computes per-doc tf vector + length
    (array filters, no explode); one 1-row global aggregate (n_docs,
    Σdl, per-term df) broadcast back; scoring is then per-row math and
    top-k is TakeOrderedAndProject (per-partition heaps + k-row driver
    merge), never a global sort. The final rank window runs over k rows.
    """
    d = widen_for_compute(docs)
    toks = whitespace_tokens(F.lower(F.col(text_col)))
    per_doc = d.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
        *[F.size(F.filter(toks, _eq_term(t))).alias(f"tf_{t}") for t in terms],
    ).filter(F.col("dl") > 0)
    per_doc = tracked_persist(per_doc)

    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).cast("bigint").alias(f"df_{t}")
            for t in terms
        ],
    )

    scored = per_doc.crossJoin(F.broadcast(stats)).withColumn(
        "avgdl", F.col("sum_dl") / F.col("n_docs")
    )
    for t in terms:
        idf = (F.col("n_docs") - F.col(f"df_{t}") + F.lit(0.5)) / (
            F.col(f"df_{t}") + F.lit(0.5)
        )
        norm = (F.col(f"tf_{t}") * F.lit(k1 + 1.0)) / (
            F.col(f"tf_{t}")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.col("avgdl")))
        )
        scored = scored.withColumn(f"w_{t}", idf * norm)
    score = F.col(f"w_{terms[0]}")
    for t in terms[1:]:
        score = score + F.col(f"w_{t}")
    scored = scored.withColumn("score", score)

    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.select(
        "doc_id",
        "dl",
        *[f"tf_{t}" for t in terms],
        "score",
    ).withColumn("rank", F.row_number().over(w))


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk(load(spark, sf_dir, "documents"), "doc_id", "text")


def _bm25_oracle(terms: tuple[str, ...] = _BM25_TERMS) -> str:
    tok = r"list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0b\f\r]+'), x -> x != '')"
    tf_cols = ",\n             ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS INT) AS tf_{t}" for t in terms
    )
    df_cols = ",\n             ".join(
        f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in terms
    )
    k1, b = _BM25_K1, _BM25_B
    # every literal is ::DOUBLE — DuckDB parses bare `1.2` as DECIMAL
    # (exact) while Spark's F.lit(1.2) is a binary double; DECIMAL
    # intermediates shift the result by an ulp
    half = "CAST(0.5 AS DOUBLE)"
    w_cols = ",\n             ".join(
        f"((n_docs - df_{t} + {half}) / (df_{t} + {half}))"
        f" * ((tf_{t} * CAST({k1 + 1.0} AS DOUBLE))"
        f" / (tf_{t} + CAST({k1} AS DOUBLE)"
        f" * (CAST({1.0 - b} AS DOUBLE) + CAST({b} AS DOUBLE) * (dl / avgdl)))) AS w_{t}"
        for t in terms
    )
    score = " + ".join(f"w_{t}" for t in terms)
    tf_out = ", ".join(f"tf_{t}" for t in terms)
    return f"""
    WITH per_doc AS (
      SELECT doc_id, CAST(len(toks) AS INT) AS dl,
             {tf_cols}
      FROM (SELECT doc_id, {tok} AS toks FROM documents)
      WHERE len(toks) > 0
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS sum_dl,
             {df_cols}
      FROM per_doc
    ),
    scored AS (
      SELECT doc_id, dl, {tf_out}, {score.replace('w_', 'w_')} AS score FROM (
        SELECT *,
             {w_cols}
        FROM (SELECT per_doc.*, stats.*, CAST(sum_dl AS DOUBLE) / n_docs AS avgdl
              FROM per_doc CROSS JOIN stats)
      )
    )
    SELECT doc_id, dl, {tf_out}, score,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
    FROM scored
    ORDER BY score DESC, doc_id ASC
    LIMIT {_BM25_TOPK}
    """


register("text_bm25_topk", text_bm25_topk, _bm25_oracle())


# --- Character-entropy quality signal ---------------------------------------


def _entropy_expr() -> Column:
    """Shannon entropy (bits) of the lowercased character distribution
    — the quality signal that separates natural text (~4 bits) from
    boilerplate/gibberish (padding and repeated runs score low,
    keyboard-mash scores high); used alongside the length/punct ratios
    in Gopher-style filtering.

    Computed entirely map-side per row: chars → sorted distinct
    symbols → per-symbol counts (O(distinct·len) array filters, no
    shuffle, no explode) → ONE aggregate fold in sorted-symbol order,
    so the float summation order is pinned on both engines. log2 is
    the one non-correctly-rounded IEEE op here; ROUND(·,4) absorbs the
    last-ulp libm spread (the cosine tiers' precedent). Warm cost at
    sf0.1 is ~0.6 s for 5000 docs (whole-stage codegen); the oracle's
    interpreted nested list_filter is the slow side of the pair."""
    chars = "transform(sequence(1, length(lower(text))), i -> substring(lower(text), i, 1))"
    cs = f"array_sort(array_distinct({chars}))"
    counts = f"transform({cs}, c -> size(filter({chars}, x -> x = c)))"
    n = f"size({chars})"
    return F.expr(
        f"round(-aggregate({counts}, cast(0.0 as double), "
        f"(acc, cnt) -> acc + (cast(cnt as double) / {n}) * log2(cast(cnt as double) / {n})), 4)"
    )


def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = widen_for_compute(load(spark, sf_dir, "documents"))
    return (
        doc.filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.length(F.lower(F.col("text"))).cast("int").alias("n_chars_counted"),
            _entropy_expr().alias("entropy_bits"),
        )
        .orderBy("doc_id")
    )


register(
    "text_char_entropy",
    text_char_entropy,
    """
    WITH base AS (
      SELECT doc_id,
             list_transform(range(1, len(lower(text)) + 1),
                            i -> substring(lower(text), i, 1)) AS chars
      FROM documents WHERE len(text) > 0
    ),
    hist AS (
      SELECT doc_id, chars,
             list_sort(list_distinct(chars)) AS cs,
             CAST(len(chars) AS INT) AS n
      FROM base
    )
    SELECT doc_id,
           n AS n_chars_counted,
           ROUND(-list_sum(list_transform(cs,
             c -> (CAST(len(list_filter(chars, x -> x = c)) AS DOUBLE) / n)
                * log2(CAST(len(list_filter(chars, x -> x = c)) AS DOUBLE) / n))), 4)
             AS entropy_bits
    FROM hist
    ORDER BY doc_id
    """,
)
