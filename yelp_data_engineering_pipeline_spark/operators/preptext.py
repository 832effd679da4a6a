"""Training-corpus preparation operators (extension, BASELINE.json
north star): document chunking, deterministic train/val splitting,
token-budget packing, PII scrubbing.

These are the remaining standard stages of an LLM data pipeline after
dedup/quality/similarity (operators/dedup.py, textstats.py,
similarity.py). All JVM-side expressions — no Python in the hot path —
and every one is a narrow map or a single partitioned window, so each
scales linearly with the corpus:

- **chunking** — token windows of size C with overlap O: per-row array
  slicing (no shuffle at all; output rows ≈ n_tokens/stride per doc).
- **hash split** — md5-keyed assignment: deterministic across runs and
  engines (no rand()), so a re-run never migrates a doc across splits.
- **packing** — contiguous-sequence binning by cumulative token budget:
  one window per group key. True bin-packing is order-dependent and
  sequential; the contiguous approximation is the standard distributed
  compromise (documented delta).
- **PII scrub** — regexp_replace with engine-portable patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cache import tracked_persist
from ..partitioning import widen_for_compute
from ..plans.catalog import register
from ..tables import load
from .textstats import whitespace_tokens

# ---------------------------------------------------------------------------
# Chunking
# ---------------------------------------------------------------------------


def chunk_documents(
    docs: DataFrame, text_col: str, id_col: str, chunk_size: int, overlap: int
) -> DataFrame:
    """Split each document into token windows of ``chunk_size`` with
    ``overlap`` tokens shared between consecutive chunks (stride =
    chunk_size - overlap). Documents shorter than one chunk yield a
    single chunk; empty documents yield none."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    ws = whitespace_tokens(F.col(text_col))
    n = F.size(ws)
    # number of windows that cover all tokens: 1 + ceil((n - C) / stride)
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.lit(1) + F.greatest(F.lit(0), F.ceil((n - chunk_size) / F.lit(stride)).cast("int"))
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), ws.alias("_ws"), n_chunks.alias("_nc")
    ).filter(F.col("_nc") > 0)
    idx = F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_idx")
    chunk = F.slice(F.col("_ws"), F.col("chunk_idx") * stride + 1, chunk_size)
    return (
        base.select("doc_id", "_ws", idx)
        .select(
            "doc_id",
            "chunk_idx",
            F.size(chunk).cast("int").alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
        )
    )


def prep_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = widen_for_compute(load(spark, sf_dir, "documents"))
    return chunk_documents(doc, "text", "doc_id", chunk_size=32, overlap=8)


register(
    "prep_chunk_documents",
    prep_chunk_documents,
    r"""
    WITH base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x != '') AS ws
      FROM documents
    ),
    sized AS (
      SELECT doc_id, ws,
             CASE WHEN len(ws) <= 0 THEN 0
                  ELSE 1 + greatest(0, CAST(ceil((len(ws) - 32) / 24.0) AS INT))
             END AS nc
      FROM base
    ),
    exploded AS (
      SELECT doc_id, ws, unnest(range(0, nc)) AS chunk_idx
      FROM sized WHERE nc > 0
    )
    SELECT doc_id,
           CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(len(ws[chunk_idx * 24 + 1 : chunk_idx * 24 + 32]) AS INT) AS n_chunk_tokens,
           md5(array_to_string(ws[chunk_idx * 24 + 1 : chunk_idx * 24 + 32], ' ')) AS chunk_md5
    FROM exploded
    """,
)


# ---------------------------------------------------------------------------
# Deterministic hash split
# ---------------------------------------------------------------------------


def hash_split(df: DataFrame, key: Column, val_pct: int) -> Column:
    """'val' for ~val_pct% of rows, 'train' for the rest — decided by
    md5(key) so the assignment is deterministic across runs, engines,
    and partitionings (never rand(): a re-run must not migrate docs
    between splits)."""
    bucket = F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("int") % 100
    return F.when(bucket < val_pct, F.lit("val")).otherwise(F.lit("train"))


def prep_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load(spark, sf_dir, "documents")
    split = hash_split(doc, F.col("text"), val_pct=10)
    return doc.groupBy("lang", split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(whitespace_tokens(F.col("text")))).cast("bigint").alias("n_tokens"),
    )


# DuckDB int-from-hex via positional nibble arithmetic (no conv()).
_HEX4 = (
    "((strpos('0123456789abcdef', substring(md5(text), 1, 1)) - 1) * 4096"
    " + (strpos('0123456789abcdef', substring(md5(text), 2, 1)) - 1) * 256"
    " + (strpos('0123456789abcdef', substring(md5(text), 3, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substring(md5(text), 4, 1)) - 1))"
)

register(
    "prep_train_val_split",
    prep_train_val_split,
    rf"""
    SELECT lang,
           CASE WHEN {_HEX4} % 100 < 10 THEN 'val' ELSE 'train' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x != ''))) AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY 1, 2
    """,
)


# ---------------------------------------------------------------------------
# Token-budget packing
# ---------------------------------------------------------------------------


def pack_by_token_budget(
    docs: DataFrame, group_col: str, id_col: str, text_col: str, budget: int
) -> DataFrame:
    """Assign documents (ordered by id within each group) to contiguous
    bins of at most ~``budget`` tokens: bin = floor(cumulative_tokens_
    before_doc / budget). Contiguous-sequence packing — the distributed
    stand-in for greedy bin packing (which is inherently sequential); a
    doc longer than the budget gets its own bin(s). One partitioned
    window per group, no other shuffle."""
    n_tok = F.size(whitespace_tokens(F.col(text_col))).cast("bigint")
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(n_tok).over(w)
    return docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tokens"),
        ((cum - n_tok) / budget).cast("bigint").alias("bin"),
    )


def prep_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load(spark, sf_dir, "documents")
    packed = pack_by_token_budget(doc, "lang", "doc_id", "text", budget=512)
    return packed.groupBy("grp", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
    )


register(
    "prep_pack_bins",
    prep_pack_bins,
    r"""
    WITH tok AS (
      SELECT lang AS grp, doc_id,
             CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x != '')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    cum AS (
      SELECT grp, doc_id, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY grp ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM tok
    )
    SELECT grp, CAST(floor((c - n_tokens) / 512.0) AS BIGINT) AS bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM cum
    GROUP BY 1, 2
    """,
)


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\(\d{3}\) \d{3}-\d{4}"


def scrub_pii(text: Column) -> Column:
    """Replace emails and phone numbers with typed placeholder tokens
    (engine-portable regex subset: no lookarounds, no \\b)."""
    out = F.regexp_replace(text, _EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, _PHONE_RE, "<PHONE>")


def prep_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = widen_for_compute(load(spark, sf_dir, "documents"))
    return doc.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_EMAIL_RE), 0)).cast("int").alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PHONE_RE), 0)).cast("int").alias("n_phones"),
        F.md5(scrub_pii(F.col("text"))).alias("scrubbed_md5"),
    )


register(
    "prep_pii_scrub",
    prep_pii_scrub,
    rf"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS INT) AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5
    FROM documents
    """,
)


# ---------------------------------------------------------------------------
# Repetition signals (Gopher/C4-style quality rules, public heuristics)
# ---------------------------------------------------------------------------


def prep_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition signals used by public corpus-filtering rules:
    duplicate-line fraction and most-frequent-bigram mass. Exact-integer
    ratios are emitted UNROUNDED (IEEE division matches across engines).

    The bigram array is materialized as a column BEFORE the counting
    lambdas: Spark re-evaluates outer array subexpressions per lambda
    element (no CSE across higher-order functions), so an inline bigram
    build would be O(n²) per row."""
    doc = widen_for_compute(load(spark, sf_dir, "documents"))
    ws = whitespace_tokens(F.col("text"))
    lines = F.filter(F.split(F.col("text"), "\\."), lambda s: F.trim(s) != "")
    m = F.size(ws) - 1
    bigrams = F.when(
        m >= 1,
        F.zip_with(F.slice(ws, 1, m), F.slice(ws, 2, m), lambda a, b: F.concat_ws(" ", a, b)),
    ).otherwise(F.array().cast("array<string>"))
    base = doc.select("doc_id", lines.alias("_ln"), bigrams.alias("_bg"))
    n_ln, n_bg = F.size("_ln"), F.size("_bg")
    top_bg = F.array_max(
        F.transform(
            F.array_distinct("_bg"),
            lambda x: F.size(F.filter(F.col("_bg"), lambda y: y == x)),
        )
    )
    return base.select(
        "doc_id",
        n_ln.cast("int").alias("n_lines"),
        F.when(n_ln > 0, 1.0 - F.size(F.array_distinct("_ln")) / n_ln)
        .otherwise(F.lit(0.0))
        .alias("dup_line_frac"),
        F.when(n_bg > 0, top_bg / n_bg).otherwise(F.lit(0.0)).alias("top_bigram_frac"),
    )


register(
    "prep_repetition_stats",
    prep_repetition_stats,
    r"""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(text, '.'), s -> trim(s) != '') AS ln,
             list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x != '') AS ws
      FROM documents
    ),
    bg AS (
      SELECT doc_id, ln,
             CASE WHEN len(ws) >= 2
                  THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])
                  ELSE [] END AS bgs
      FROM base
    )
    SELECT doc_id,
           CAST(len(ln) AS INT) AS n_lines,
           CASE WHEN len(ln) > 0 THEN 1.0 - len(list_distinct(ln)) / len(ln)
                ELSE 0.0 END AS dup_line_frac,
           CASE WHEN len(bgs) > 0
                THEN list_max(list_transform(list_distinct(bgs),
                                             x -> len(list_filter(bgs, y -> y = x)))) / len(bgs)
                ELSE 0.0 END AS top_bigram_frac
    FROM bg
    """,
)


# ---------------------------------------------------------------------------
# Decontamination: held-out n-gram containment in the training corpus
# ---------------------------------------------------------------------------


def contamination_fractions(
    heldout: DataFrame, train: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """For each held-out doc: the fraction of its 3-gram shingles that
    occur anywhere in the training corpus — the standard eval-set
    decontamination signal. Plan: distinct train shingles (one shuffle,
    partial-agg'd), LEFT SEMI join from exploded held-out shingles
    (never materializes train x heldout), per-doc exact-int ratio."""
    from .dedup import shingles

    held_sh = (
        heldout.select(F.col(id_col).alias("doc_id"), shingles(F.col(text_col)).alias("sh"))
        .filter(F.size("sh") > 0)
        .select("doc_id", F.size("sh").alias("n_shingles"), F.explode("sh").alias("shingle"))
    )
    train_sh = (
        train.select(F.explode(shingles(F.col(text_col))).alias("shingle")).distinct()
    )
    hits = (
        held_sh.join(train_sh, "shingle", "left_semi")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    base = held_sh.select("doc_id", "n_shingles").distinct()
    return base.join(hits, ["doc_id", "n_shingles"], "left").select(
        "doc_id",
        F.col("n_shingles").cast("int").alias("n_shingles"),
        (F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_shingles")).alias("contaminated_frac"),
    )


def prep_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = widen_for_compute(load(spark, sf_dir, "documents"))
    heldout = doc.filter(F.col("doc_id") < 50)
    train = doc.filter(F.col("doc_id") >= 50)
    return contamination_fractions(heldout, train, "doc_id", "text")


# DuckDB twin reuses the shingle pipeline from the dedup oracles.
_SHINGLE_WS = r"list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x != '')"
_SHINGLE_LIST = (
    f"list_distinct(list_transform(range(1, greatest(len({_SHINGLE_WS}) - 1, 1)),"
    f" i -> array_to_string(({_SHINGLE_WS})[i:i+2], ' ')))"
)

register(
    "prep_decontaminate",
    prep_decontaminate,
    rf"""
    WITH held AS (
      SELECT doc_id, {_SHINGLE_LIST} AS sh FROM documents
      WHERE doc_id < 50 AND len({_SHINGLE_WS}) >= 3
    ),
    held_x AS (
      SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS shingle FROM held
    ),
    train_sh AS (
      SELECT DISTINCT unnest({_SHINGLE_LIST}) AS shingle FROM documents
      WHERE doc_id >= 50 AND len({_SHINGLE_WS}) >= 3
    ),
    hits AS (
      SELECT doc_id, n_shingles, COUNT(*) AS n_hits
      FROM held_x WHERE shingle IN (SELECT shingle FROM train_sh)
      GROUP BY doc_id, n_shingles
    )
    SELECT b.doc_id,
           CAST(b.n_shingles AS INT) AS n_shingles,
           COALESCE(h.n_hits, 0) / b.n_shingles AS contaminated_frac
    FROM (SELECT DISTINCT doc_id, n_shingles FROM held_x) b
    LEFT JOIN hits h ON b.doc_id = h.doc_id AND b.n_shingles = h.n_shingles
    """,
)


# ---------------------------------------------------------------------------
# Vocabulary build (tokenizer-training prep)
# ---------------------------------------------------------------------------


def build_vocab(
    docs: DataFrame, text_col: str, id_col: str, min_df: int, top_k: int
) -> DataFrame:
    """Top-``top_k`` tokens by corpus frequency with document frequency
    >= ``min_df``. explode → two partial-agg'd shuffles → distributed
    top-k (TakeOrdered merge, never a single-partition sort).

    Requires a real document id column: a generated id
    (monotonically_increasing_id) in the same select as the explode is
    evaluated per EXPLODED row, silently turning doc_freq into an
    occurrence count."""
    tok = docs.select(
        F.col(id_col).alias("_doc"),
        F.explode(whitespace_tokens(F.col(text_col))).alias("token"),
    )
    counts = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("_doc").alias("doc_freq"),
    )
    return (
        counts.filter(F.col("doc_freq") >= min_df)
        .orderBy(F.col("n_occurrences").desc(), "token")
        .limit(top_k)
        .select("token", "n_occurrences", F.col("doc_freq").cast("bigint").alias("doc_freq"))
    )


def prep_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = widen_for_compute(load(spark, sf_dir, "documents"))
    return build_vocab(doc, "text", "doc_id", min_df=5, top_k=100)


register(
    "prep_vocab",
    prep_vocab,
    r"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x != '')) AS token
      FROM documents
    ),
    counts AS (
      SELECT token, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS doc_freq
      FROM tok GROUP BY token
    )
    SELECT token, n_occurrences, CAST(doc_freq AS BIGINT) AS doc_freq
    FROM counts WHERE doc_freq >= 5
    ORDER BY n_occurrences DESC, token
    LIMIT 100
    """,
)


# ---------------------------------------------------------------------------
# Stratified (balanced) sampling
# ---------------------------------------------------------------------------


def stratified_sample_balanced(
    docs: DataFrame, group_col: str, key_col: str
) -> DataFrame:
    """Downsample every group to ~the smallest group's size, keyed by
    content hash (deterministic across runs/engines/partitionings, like
    :func:`hash_split` — never rand()).

    Acceptance is PURE INTEGER arithmetic: keep a row iff
    ``bucket * n_g < min_n * 65536`` where bucket = first 16 bits of
    md5(key). Equivalent to bucket/65536 < min_n/n_g but with no float
    division to drift between engines.

    Scale shape: one bounded-cardinality hash-agg for group counts, a
    broadcast join of those counts plus a broadcast 1-row minimum, then
    a map-side filter — the corpus itself is never shuffled.
    """
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_g"))
    min_n = counts.select(F.min("n_g").alias("min_n"))
    bucket = F.conv(F.substring(F.md5(F.col(key_col)), 1, 4), 16, 10).cast("long")
    return (
        docs.join(F.broadcast(counts), group_col)
        .crossJoin(F.broadcast(min_n))
        .filter(bucket * F.col("n_g") < F.col("min_n") * 65536)
        .drop("n_g", "min_n")
    )


def prep_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load(spark, sf_dir, "documents")
    return stratified_sample_balanced(doc, "lang", "text").select("doc_id", "lang")


register(
    "prep_stratified_sample",
    prep_stratified_sample,
    rf"""
    WITH counts AS (SELECT lang, COUNT(*) AS n_g FROM documents GROUP BY lang),
    m AS (SELECT MIN(n_g) AS min_n FROM counts)
    SELECT doc_id, lang
    FROM documents JOIN counts USING (lang) CROSS JOIN m
    WHERE {_HEX4} * n_g < min_n * 65536
    """,
)


# ---------------------------------------------------------------------------
# End-to-end corpus prep (composed pipeline)
# ---------------------------------------------------------------------------


def pipeline_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole prep flow as ONE Catalyst plan: quality gate
    (n_tokens ≥ 10) → exact-dedup keep-first → 32/8 token chunking →
    deterministic train/val split of the CHUNKS (keyed on chunk content
    hash, so a re-chunk never migrates chunks between splits) →
    per-split corpus stats. No materialization between stages — the
    optimizer sees the full pipeline and fuses the narrow stages; the
    only shuffles are the dedup window and the final bounded agg.

    This is the composition a real training-data run executes; the
    single-op entries (text_quality, dedup_exact_keep_first,
    prep_chunk_documents, prep_train_val_split) are its unit tests.
    """
    from .dedup import dedup_keep_first

    doc = widen_for_compute(load(spark, sf_dir, "documents"))
    feat = doc.withColumn("n_tokens", F.size(whitespace_tokens(F.col("text"))))
    kept = dedup_keep_first(feat.filter(F.col("n_tokens") >= 10), "text", "doc_id")
    chunks = chunk_documents(kept, "text", "doc_id", chunk_size=32, overlap=8)
    split = hash_split(chunks, F.col("chunk_md5"), val_pct=10)
    return (
        chunks.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_chunk_tokens").cast("bigint").alias("n_tokens"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
    )


_CHUNK_HEX4 = (
    "((strpos('0123456789abcdef', substring(md5(chunk_md5), 1, 1)) - 1) * 4096"
    " + (strpos('0123456789abcdef', substring(md5(chunk_md5), 2, 1)) - 1) * 256"
    " + (strpos('0123456789abcdef', substring(md5(chunk_md5), 3, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substring(md5(chunk_md5), 4, 1)) - 1))"
)

register(
    "pipeline_corpus_prep",
    pipeline_corpus_prep,
    rf"""
    WITH feat AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x != '') AS ws
      FROM documents
    ),
    kept AS (
      SELECT doc_id, ws FROM (
        SELECT doc_id, ws, len(ws) AS n_tokens,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM feat
      ) WHERE rn = 1 AND n_tokens >= 10
    ),
    sized AS (
      SELECT doc_id, ws,
             CASE WHEN len(ws) <= 0 THEN 0
                  ELSE 1 + greatest(0, CAST(ceil((len(ws) - 32) / 24.0) AS INT))
             END AS nc
      FROM kept
    ),
    chunks AS (
      SELECT doc_id,
             CAST(len(ws[chunk_idx * 24 + 1 : chunk_idx * 24 + 32]) AS INT) AS n_chunk_tokens,
             md5(array_to_string(ws[chunk_idx * 24 + 1 : chunk_idx * 24 + 32], ' ')) AS chunk_md5
      FROM (SELECT doc_id, ws, unnest(range(0, nc)) AS chunk_idx FROM sized WHERE nc > 0)
    )
    SELECT CASE WHEN {_CHUNK_HEX4} % 100 < 10 THEN 'val' ELSE 'train' END AS split,
           COUNT(*) AS n_chunks,
           CAST(SUM(n_chunk_tokens) AS BIGINT) AS n_tokens,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM chunks
    GROUP BY 1
    """,
)


# ---------------------------------------------------------------------------
# Equi-depth length binning (batch-balancing prep for sequence packing)
# ---------------------------------------------------------------------------


def length_bins(docs: DataFrame, k: int, length_col: str, tiebreak: str) -> DataFrame:
    """Assign each document to one of ``k`` equi-depth length bins
    (NTILE semantics over (length, tiebreak) total order).

    Length-bucketed batching/packing wants equal-POPULATION bins, not
    equal-width ones (token lengths are heavy-tailed: fixed-width bins
    put 90% of docs in bin 1). Computed with the two-phase distributed
    rank (operators/ids.py) + integer NTILE arithmetic — no
    single-partition window at any scale.
    """
    from .ids import dense_ids_with_total, ntile_from_rank

    ranked, n = dense_ids_with_total(
        docs,
        length_col,
        tiebreak,
        id_col="_rank",
        num_partitions=docs.sparkSession.sparkContext.defaultParallelism,
    )
    return ranked.withColumn("bin", ntile_from_rank(F.col("_rank"), n, k)).drop("_rank")


def prep_length_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return length_bins(docs, 4, "n_chars", "doc_id").select(
        "doc_id", "n_chars", F.col("bin").alias("len_bin")
    )


register(
    "prep_length_bins",
    prep_length_bins,
    """
    SELECT doc_id, n_chars,
           NTILE(4) OVER (ORDER BY n_chars, doc_id) AS len_bin
    FROM documents
    """,
)


# ---------------------------------------------------------------------------
# Deterministic shard assignment (training-shard export companion)
# ---------------------------------------------------------------------------


def shard_assignment(key: Column, n_shards: int) -> Column:
    """Stable shard id in [0, n_shards) from md5(key) — deterministic
    across runs, engines, partitionings, and cluster sizes (never
    rand()/spark_partition_id(): a re-export must not migrate rows
    between shards, or downstream trainers lose resume points).
    8 hex nibbles = 32 bits, exact in a long."""
    return (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % n_shards).cast(
        "int"
    )


def prep_shard_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard balance evidence: row count per deterministic shard. A
    skewed histogram here means skewed training files — check it
    BEFORE a 100 TB export, not after."""
    doc = load(spark, sf_dir, "documents")
    shard = shard_assignment(F.col("doc_id").cast("string"), 16)
    return doc.groupBy(shard.alias("shard")).agg(F.count(F.lit(1)).alias("n_docs"))


# DuckDB int-from-hex for the first 8 md5 nibbles of the doc_id string.
_HEX8_DOCID = (
    "("
    + " + ".join(
        f"(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    + ")"
)

register(
    "prep_shard_histogram",
    prep_shard_histogram,
    f"""
    SELECT CAST({_HEX8_DOCID} % 16 AS INT) AS shard, COUNT(*) AS n_docs
    FROM documents
    GROUP BY 1
    """,
)


# ---------------------------------------------------------------------------
# Token-budget mixture selection (data-mixing step)
# ---------------------------------------------------------------------------


def select_by_token_budget(
    docs: DataFrame, source_col: str, id_col: str, text_col: str, budget: Column
) -> DataFrame:
    """Greedy per-source document selection up to a token ``budget`` —
    the mixture-construction step of a training-data pipeline ("take
    400M tokens of src A, 800M of src B").

    Docs are taken in md5(id) priority order (deterministic pseudo-random
    — a re-run or engine change must select the SAME docs, so never
    rand()); a doc is selected while the tokens accumulated BEFORE it are
    still under budget, i.e. the first doc to cross the line is kept and
    the budget may overshoot by at most one document — the standard
    greedy contract, and crucially a PREFIX property: selection of doc k
    depends only on docs ahead of it in the order, never on a global
    optimum.

    Scale: one hash shuffle on source + one per-source sort — the same
    shape as contiguous bin packing above. A whale source serializes its
    own partition only; if one source is >~100 GB of tokens, pre-split it
    into salted sub-sources upstream and give each a share of the budget.
    """
    n_tok = F.size(whitespace_tokens(F.col(text_col))).cast("bigint")
    prio = F.md5(F.col(id_col).cast("string"))
    before = (
        Window.partitionBy(source_col)
        .orderBy(prio, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(n_tok).over(before), F.lit(0))
    return docs.select(
        F.col(source_col),
        F.col(id_col),
        n_tok.alias("n_tokens"),
        budget.alias("budget"),
        (cum_before < budget).alias("selected"),
    )


def prep_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixture report: how many docs/tokens the greedy
    selection kept against an even/odd-source budget rule (even-numbered
    sources get 2x the token budget — a stand-in for real mixture
    weights, chosen as a RULE not a literal map so the query is
    scale-factor independent)."""
    doc = load(spark, sf_dir, "documents")
    src_num = F.expr("substring(source, 4)").cast("int")
    budget = F.when(src_num % 2 == 0, F.lit(800)).otherwise(F.lit(400)).cast("bigint")
    sel = select_by_token_budget(doc, "source", "doc_id", "text", budget)
    return (
        sel.groupBy("source", "budget")
        .agg(
            F.count(F.lit(1)).alias("n_docs_total"),
            F.sum(F.when(F.col("selected"), 1).otherwise(0)).cast("bigint").alias("n_selected"),
            F.sum(F.when(F.col("selected"), F.col("n_tokens")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("tokens_selected"),
        )
        .orderBy("source")
    )


register(
    "prep_token_budget_mix",
    prep_token_budget_mix,
    r"""
    WITH tok AS (
      SELECT source, doc_id,
             CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x != '')) AS BIGINT) AS n_tokens,
             CAST(CASE WHEN CAST(substring(source, 4) AS INT) % 2 = 0 THEN 800 ELSE 400 END AS BIGINT) AS budget
      FROM documents
    ),
    cum AS (
      SELECT source, doc_id, n_tokens, budget,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM tok
    )
    SELECT source, budget,
           COUNT(*) AS n_docs_total,
           CAST(SUM(CASE WHEN cum_before < budget THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
           CAST(SUM(CASE WHEN cum_before < budget THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_selected
    FROM cum
    GROUP BY source, budget
    ORDER BY source
    """,
)


# ---------------------------------------------------------------------------
# Leakage-safe split (cluster-aware train/val)
# ---------------------------------------------------------------------------


def leakage_safe_split(docs: DataFrame, pairs: DataFrame, val_pct: int = 10) -> DataFrame:
    """Train/val split decided per NEAR-DUP CLUSTER, not per document:
    hash-splitting raw doc ids puts near-duplicates of a training doc
    into validation (the classic eval-leakage bug); here every member of
    a connected near-dup cluster lands on the same side because the
    hash key is the cluster id.

    Returns (doc_id, cluster_id, split). Scale: cluster labels come from
    the CC propagation (|pairs|-bounded), the split is a pure projection
    — no extra shuffle beyond the label join."""
    from .graph import assign_clusters

    labeled = assign_clusters(docs, pairs)
    return labeled.select(
        "doc_id",
        "cluster_id",
        hash_split(labeled, F.col("cluster_id").cast("string"), val_pct).alias("split"),
    )


def prep_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import minhash_lsh_pairs

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", jaccard_threshold=0.5)
    split = leakage_safe_split(docs, pairs)
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("cluster_id").cast("bigint").alias("n_clusters"),
    ).orderBy("split")


def _hex4_of(expr: str) -> str:
    """DuckDB int of the first 4 md5 nibbles of ``expr`` (no conv())."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substring(md5({expr}), {i + 1}, 1)) - 1)"
            f" * {16 ** (3 - i)}"
            for i in range(4)
        )
        + ")"
    )


def _leakage_split_oracle() -> str:
    from .dedup import _MINHASH_ORACLE

    hex4 = _hex4_of("CAST(cluster_id AS VARCHAR)")
    return f"""
    WITH RECURSIVE
    pairs AS (SELECT doc_a, doc_b FROM ({_MINHASH_ORACLE}) WHERE jaccard >= 0.5),
    edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(a, b) AS (
        SELECT s, s FROM edges
        UNION
        SELECT r.a, e.d FROM reach r JOIN edges e ON r.b = e.s
    ),
    labels AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
    lab AS (SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN labels l USING (doc_id)),
    splits AS (SELECT doc_id, cluster_id,
                      CASE WHEN {hex4} % 100 < 10 THEN 'val' ELSE 'train' END AS split
               FROM lab)
    SELECT split, COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters
    FROM splits GROUP BY split ORDER BY split
    """


register("prep_leakage_safe_split", prep_leakage_safe_split, _leakage_split_oracle())


# ---------------------------------------------------------------------------
# Source-interleaved training order
# ---------------------------------------------------------------------------


def interleave_by_source(docs: DataFrame, source_col: str, id_col: str) -> DataFrame:
    """Deterministic global training order that round-robins sources:
    docs are ranked within their source by md5 priority, then ordered by
    (rank, source) — position k·|sources|+j holds source j's k-th doc,
    so no contiguous run of one source ever exceeds 1 (while any source
    still has docs). Long single-source runs are the classic
    training-order pathology this prevents.

    Scale: one hash shuffle + per-source sort for the rank; the global
    (rank, source) order is only materialized by whoever consumes it
    (e.g. repartitionByRange into shards) — no single-partition stage
    here."""
    w = Window.partitionBy(source_col).orderBy(F.md5(F.col(id_col).cast("string")), id_col)
    return docs.select(
        F.col(source_col),
        F.col(id_col),
        (F.row_number().over(w) - 1).alias("rank_in_source"),
    )


def prep_interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 60 positions of the interleaved order — enough to SEE the
    round-robin — plus each doc's global position."""
    doc = load(spark, sf_dir, "documents")
    ranked = interleave_by_source(doc, "source", "doc_id")
    return (
        ranked.orderBy("rank_in_source", "source")
        .limit(60)
        .select("source", "doc_id", "rank_in_source")
    )


register(
    "prep_interleave_sources",
    prep_interleave_sources,
    """
    WITH ranked AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS rank_in_source
      FROM documents
    )
    SELECT source, doc_id, rank_in_source
    FROM ranked
    ORDER BY rank_in_source, source
    LIMIT 60
    """,
)


# ---------------------------------------------------------------------------
# Quantile score normalization (cross-source fairness)
# ---------------------------------------------------------------------------


def prep_score_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-source percentile rank of a raw score (here n_chars) —
    quantile normalization, the curation trick that makes quality
    cutoffs comparable ACROSS sources with different score scales ("keep
    every source's top 30%" instead of one absolute threshold that
    empties some feeds and keeps others whole).

    percent_rank = (rank-1)/(n-1) is a single division of identical
    integers in both engines — bit-exact; ties share a rank by
    definition. One per-source window, nothing global."""
    doc = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return doc.select(
        "doc_id",
        "source",
        "n_chars",
        F.percent_rank().over(w).alias("score_pct"),
    ).orderBy("doc_id")


register(
    "prep_score_quantile_norm",
    prep_score_quantile_norm,
    """
    SELECT doc_id, source, n_chars,
           PERCENT_RANK() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS score_pct
    FROM documents
    ORDER BY doc_id
    """,
)


# ---------------------------------------------------------------------------
# Composite rule filter (Gopher/C4-style document gates)
# ---------------------------------------------------------------------------


def rule_filter(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style composite cleaning gates: per-document boolean
    rules plus the AND'ed keep decision — the rule-based sibling of
    textstats.quality_score's weighted score (Rae et al. 2021 §A1.1
    tradition; thresholds sized to the synthetic corpus so every rule
    discriminates: word-count 394/500 pass, word-len 495/500, alpha
    318/500, stopword 388/500, keep 196/500 at sf0.01 — no vacuous
    flags).

    Scale: a single narrow map over the text column — identical feature
    expressions to text_quality (whitespace tokens, exact-int ratios),
    zero shuffle; filters compose downstream via the keep column.
    """
    from .textstats import _STOPWORDS

    ws = whitespace_tokens(F.col(text_col))
    n_tokens = F.size(ws)
    n_chars = F.length(F.col(text_col))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", ""))
    n_stop = F.size(F.filter(ws, lambda x: F.lower(x).isin(*_STOPWORDS)))
    # exact-int divisions: bit-identical across engines (textstats note)
    avg_word_len = n_chars.cast("double") / F.nullif(n_tokens, F.lit(0))
    alpha_ratio = n_alpha.cast("double") / F.nullif(n_chars, F.lit(0))
    r_word_count = n_tokens.between(30, 10_000)
    # coalesce(False): on an empty/whitespace-only document the nullif
    # divisor makes the ratios NULL — the documented gate semantics say
    # every rule is a concrete pass/fail, so NULL ratios FAIL the rule
    # (matches the pure-Python model in tests/test_properties.py;
    # ADVICE r4).
    r_word_len = F.coalesce(avg_word_len.between(3.0, 6.0), F.lit(False))
    r_alpha = F.coalesce(alpha_ratio >= 0.82, F.lit(False))
    r_stopword = n_stop >= 2
    return docs.select(
        "doc_id",
        n_tokens.cast("int").alias("n_tokens"),
        r_word_count.alias("r_word_count"),
        r_word_len.alias("r_word_len"),
        r_alpha.alias("r_alpha"),
        r_stopword.alias("r_stopword"),
        (r_word_count & r_word_len & r_alpha & r_stopword).alias("keep"),
    )


def prep_rule_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rule_filter(widen_for_compute(load(spark, sf_dir, "documents")))


def _rule_filter_oracle() -> str:
    from .textstats import _STOPWORDS

    stop_in = ", ".join(f"'{w}'" for w in _STOPWORDS)
    return rf"""
    WITH base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x != '') AS ws,
             length(text) AS n_chars,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha
      FROM documents
    ),
    f AS (
      SELECT doc_id,
             CAST(len(ws) AS INT) AS n_tokens,
             CAST(n_chars AS DOUBLE) / nullif(len(ws), 0) AS awl,
             CAST(n_alpha AS DOUBLE) / nullif(n_chars, 0) AS ar,
             len(list_filter(ws, x -> lower(x) IN ({stop_in}))) AS n_stop
      FROM base
    )
    SELECT doc_id, n_tokens,
           n_tokens BETWEEN 30 AND 10000 AS r_word_count,
           coalesce(awl BETWEEN 3.0 AND 6.0, false) AS r_word_len,
           coalesce(ar >= 0.82, false) AS r_alpha,
           n_stop >= 2 AS r_stopword,
           (n_tokens BETWEEN 30 AND 10000)
             AND coalesce(awl BETWEEN 3.0 AND 6.0, false)
             AND coalesce(ar >= 0.82, false) AND (n_stop >= 2) AS keep
    FROM f
    """


register("prep_rule_filter", prep_rule_filter, _rule_filter_oracle())


# --- Deterministic global shuffle for training order ------------------------

def global_shuffle(df: DataFrame, key: Column, n_shards: int) -> DataFrame:
    """(shard, pos) for every row: a reproducible corpus-order
    randomization for training epochs. The order key is md5(key) —
    deterministic across runs/engines/cluster sizes, unlike
    rand()/monotonically_increasing_id(), so epoch order (and any
    resume point inside it) is stable across re-exports.

    Scale shape: shard assignment is map-side; positions need ONE
    shuffle keyed by shard plus a per-shard local sort on the hash key
    — rows/shard ≈ corpus/n_shards, so the sort is bounded by shard
    sizing, and there is no global sort anywhere. This is the missing
    half of prep_shard_histogram (which audits balance only): the
    histogram says shards are even, this emits the actual order."""
    hashed = df.withColumn("_ok", F.md5(key)).withColumn(
        "_shard", shard_assignment(key, n_shards)
    )
    w = Window.partitionBy("_shard").orderBy("_ok", key)
    return (
        hashed.withColumn("pos", F.row_number().over(w).cast("bigint"))
        .withColumn("shard", F.col("_shard"))
        .drop("_ok", "_shard")
    )


def prep_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load(spark, sf_dir, "documents")
    out = global_shuffle(doc, F.col("doc_id").cast("string"), 16)
    return out.select("doc_id", "shard", "pos").orderBy("shard", "pos")


register(
    "prep_global_shuffle",
    prep_global_shuffle,
    f"""
    SELECT doc_id,
           CAST({_HEX8_DOCID} % 16 AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY {_HEX8_DOCID} % 16
             ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)
           ) AS BIGINT) AS pos
    FROM documents
    ORDER BY shard, pos
    """,
)


# --- BPE merge training (iterative, fully declarative) ----------------------

BPE_ROUNDS = 5

_BPE_MERGE_EXPR = """
    slice(
      aggregate(w, array('<i>'),
        (acc, x) -> CASE WHEN size(acc) > 1 AND element_at(acc, -1) = a AND x = b
                    THEN concat(slice(acc, 1, size(acc) - 1), array(concat(a, b)))
                    ELSE concat(acc, array(x)) END),
      2, 2147483647)
"""


def bpe_merges(tokens_weighted: DataFrame, rounds: int = BPE_ROUNDS) -> DataFrame:
    """Byte-pair-encoding merge training, distributed and declarative —
    the tokenizer-training iterative op (Sennrich et al., ACL'16 BPE)
    next to k-means/PageRank in this engine's iterative family.

    Input: (token, n) weighted vocabulary. Each round:
    1. adjacent-pair counts over current symbol sequences — one
       map-combined groupBy (shuffle carries the PAIR VOCABULARY, not
       the corpus);
    2. best pair = (count desc, pair asc) — a 1-row broadcast, joined
       back instead of collected, so the whole multi-round plan is
       driver-free (unlike k-means' centroid collect);
    3. greedy left-to-right merge of that pair inside every token — an
       aggregate fold with a sentinel-seeded array accumulator
       (identical fold in the DuckDB oracle via list_reduce; greedy
       order makes overlapping runs like 'aaa' unambiguous).

    Per-round state (the symbol arrays) is persisted: without it round
    k's plan re-derives every earlier round per action. Production BPE
    adds pair-count DELTAS (only words containing the merged pair
    change); the full recount here keeps the oracle exactly equivalent
    — the delta optimization changes cost, not results.

    Returns one row per round: (merge_round, left_sym, right_sym,
    merged, pair_count) — the merge table a tokenizer ships."""
    out, _ = _bpe_train(tokens_weighted, rounds)
    return out


def _bpe_train(tokens_weighted: DataFrame, rounds: int):
    """(merge table, final symbol state) — shared by train and encode."""
    w = tokens_weighted.select(
        F.expr("transform(sequence(1, length(token)), i -> substring(token, i, 1))").alias("w"),
        F.col("n"),
    )
    # Parse each per-round expression ONCE outside the loop (r14, guide
    # §7.3 — VERDICT r13 next-8): Columns are reusable unresolved
    # trees, so the adjacent-pair zip and the merge fold don't need a
    # fresh py4j construction + parse per training round.
    pair_col = F.explode(
        F.arrays_zip(
            F.expr("slice(w, 1, size(w) - 1)").alias("a"),
            F.expr("slice(w, 2, size(w) - 1)").alias("b"),
        )
    ).alias("p")
    merge_col = F.expr(_BPE_MERGE_EXPR).alias("w")
    out = None
    for r in range(1, rounds + 1):
        w = tracked_persist(w)
        pairs = (
            w.select(pair_col, "n")
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "n")
            .groupBy("a", "b")
            .agg(F.sum("n").cast("bigint").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), "a", "b").limit(1)
        row = best.select(
            F.lit(r).alias("merge_round"),
            F.col("a").alias("left_sym"),
            F.col("b").alias("right_sym"),
            F.concat("a", "b").alias("merged"),
            F.col("cnt").alias("pair_count"),
        )
        out = row if out is None else out.unionAll(row)
        w = w.crossJoin(F.broadcast(best)).select(merge_col, "n")
    return out.orderBy("merge_round"), w


def bpe_encode_stats(tokens_weighted: DataFrame, rounds: int = BPE_ROUNDS) -> DataFrame:
    """Corpus token statistics under the learned BPE vocabulary — the
    ENCODE half of the tokenizer: apply the trained merge table to the
    weighted vocabulary and count occurrences per final symbol. The
    compression a merge table buys (fewer, longer symbols) is exactly
    what this table shows; at 100 TB encode is a map-side fold per
    token against the broadcast merge table — no shuffle beyond the
    final symbol count."""
    _, w = _bpe_train(tokens_weighted, rounds)
    return (
        w.select(F.explode("w").alias("symbol"), "n")
        .groupBy("symbol")
        .agg(F.sum("n").cast("bigint").alias("n_occurrences"))
        .orderBy("symbol")
    )


def prep_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load(spark, sf_dir, "documents")
    vocab = (
        doc.select(F.explode(whitespace_tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return bpe_encode_stats(vocab)


def prep_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load(spark, sf_dir, "documents")
    vocab = (
        doc.select(F.explode(whitespace_tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return bpe_merges(vocab)


def _bpe_oracle(rounds: int = BPE_ROUNDS) -> str:
    tok = r"list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0b\f\r]+'), x -> x != '')"
    ctes = [
        f"""vocab AS (
      SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT unnest({tok}) AS t FROM documents) GROUP BY 1
    )""",
        """w0 AS (
      SELECT list_transform(range(1, len(token) + 1), i -> substring(token, i, 1)) AS w, n
      FROM vocab
    )""",
    ]
    for r in range(1, rounds + 1):
        prev = f"w{r - 1}"
        ctes.append(f"""p{r} AS (
      SELECT w[i] AS a, w[i + 1] AS b, CAST(SUM(n) AS BIGINT) AS cnt
      FROM (SELECT w, n, unnest(range(1, len(w))) AS i FROM {prev})
      GROUP BY 1, 2
    )""")
        ctes.append(f"""b{r} AS (SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1)""")
        ctes.append(f"""w{r} AS (
      SELECT list_reduce(
               list_prepend(['<i>'], list_transform(w, x -> [x])),
               (acc, x) -> CASE WHEN len(acc) > 1 AND acc[-1] = b{r}.a AND x[1] = b{r}.b
                           THEN list_append(acc[:-2], b{r}.a || b{r}.b)
                           ELSE list_append(acc, x[1]) END)[2:] AS w, n
      FROM {prev} CROSS JOIN b{r}
    )""")
    rows = "\n    UNION ALL ".join(
        f"SELECT {r} AS merge_round, a AS left_sym, b AS right_sym, a || b AS merged, cnt AS pair_count FROM b{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + f"\n    {rows}\n    ORDER BY merge_round"


register("prep_bpe_merges", prep_bpe_merges, _bpe_oracle())


def _bpe_encode_oracle(rounds: int = BPE_ROUNDS) -> str:
    base = _bpe_oracle(rounds)
    # reuse the unrolled CTE chain; replace the merge-table SELECT with
    # a symbol histogram over the final state w{rounds}
    head = base[: base.index("SELECT 1 AS merge_round")]
    return (
        head
        + f"""SELECT symbol, CAST(SUM(n) AS BIGINT) AS n_occurrences
    FROM (SELECT unnest(w) AS symbol, n FROM w{rounds})
    GROUP BY symbol
    ORDER BY symbol"""
    )


register("prep_bpe_encode", prep_bpe_encode, _bpe_encode_oracle())


# ---------------------------------------------------------------------------
# DSIR-style importance weights (hashed-n-gram likelihood ratio)
# ---------------------------------------------------------------------------

_DSIR_B = 1024  # hash buckets for the bag-of-ngrams LMs


def dsir_importance_scores(
    docs: DataFrame, target_pred, id_col: str = "doc_id", text_col: str = "text",
    n_buckets: int = _DSIR_B,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169), the hashed-n-gram variant: score every raw
    document by how much more likely its tokens are under a TARGET
    distribution (here: the subset matching ``target_pred``) than under
    the raw corpus — the standard recipe for tilting a web crawl toward
    a quality/domain target without training a classifier.

    Token unigrams hash into ``n_buckets`` buckets; both "LMs" are
    Laplace-smoothed bucket frequencies, p[b] = (c[b]+1)/(N+B). The
    per-bucket log-ratio ln(p_t[b]) - ln(p_r[b]) is rounded to 6
    decimals and SCALED TO INTEGER MICRO-UNITS, so each document's
    score is an exact integer dot product  Σ c_doc[b]·lr_micro[b] —
    order-free and bit-identical across engines (float summation order
    would differ between Spark's partial aggregation and DuckDB's
    scan; the one libm call happens once per bucket on identical
    doubles and is rounded coarsely enough that a 1-ulp ln() skew
    cannot flip it — the sampling.py determinism recipe).

    Scale: token explode → (doc, bucket) counts with map-side combine;
    the two LM profiles are <= n_buckets rows (broadcast); the scoring
    join is bucket-keyed. Resample by score with weighted_sample
    (sampling.py) to complete the DSIR pipeline.
    """
    toks = widen_for_compute(docs).select(
        F.col(id_col).alias("doc_id"),
        target_pred.alias("is_target"),
        F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("w"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("dsir|"), F.col("w"))), 1, 4), 16, 10)
        .cast("bigint") % n_buckets
    )
    dc = toks.select("doc_id", "is_target", bucket.alias("b")).groupBy(
        "doc_id", "is_target", "b"
    ).agg(F.count(F.lit(1)).alias("c"))
    dc = tracked_persist(dc)
    prof = dc.groupBy("b").agg(
        F.sum(F.when(F.col("is_target"), F.col("c")).otherwise(0)).alias("ct"),
        F.sum("c").alias("cr"),
    )
    wall = Window.partitionBy()  # n_buckets rows — bounded tiny frame
    lr = prof.select(
        "b",
        # round AFTER scaling: round(x, 6) * 1e6 is generally NOT an
        # integral double, and Spark's double->bigint cast truncates
        # while DuckDB's rounds — the 1-micro-unit skew that failed the
        # sf0.1 differential. round(x * 1e6, 0) is exactly integral, so
        # the cast is exact on both engines.
        F.round(
            (
                F.log((F.col("ct") + 1) / (F.sum("ct").over(wall) + n_buckets))
                - F.log((F.col("cr") + 1) / (F.sum("cr").over(wall) + n_buckets))
            )
            * 1_000_000,
            0,
        )
        .cast("bigint")
        .alias("lr_micro"),
    )
    scored = (
        dc.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_toks"),
            F.sum(F.col("c") * F.col("lr_micro")).cast("bigint").alias("score_micro"),
        )
    )
    return scored


def prep_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance scores for tilting the corpus toward English docs."""
    docs = load(spark, sf_dir, "documents")
    return dsir_importance_scores(docs, F.col("lang") == "en")


def _hex4_dsir(expr: str) -> str:
    """hex→int over the first 4 md5 nibbles (DuckDB has no conv())."""
    terms = [
        f"CAST((strpos('0123456789abcdef', substring({expr}, {1 + i}, 1)) - 1) AS BIGINT)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    ]
    return "(" + " + ".join(terms) + ")"


register(
    "prep_dsir_scores",
    prep_dsir_scores,
    f"""
    WITH toks AS (
      SELECT doc_id, lang = 'en' AS is_target,
             unnest(list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0b\f\r]+'),
                    x -> x != '')) AS w
      FROM documents
    ),
    dc AS (
      SELECT doc_id, is_target,
             ({_hex4_dsir("md5('dsir|' || w)")}) % {_DSIR_B} AS b,
             COUNT(*) AS c
      FROM toks GROUP BY 1, 2, 3
    ),
    prof AS (
      SELECT b,
             SUM(CASE WHEN is_target THEN c ELSE 0 END) AS ct,
             SUM(c) AS cr
      FROM dc GROUP BY b
    ),
    lr AS (
      SELECT b,
             CAST(ROUND(
               ln((ct + 1) / (SUM(ct) OVER () + {_DSIR_B}))
               - ln((cr + 1) / (SUM(cr) OVER () + {_DSIR_B})), 6) * 1000000 AS BIGINT)
               AS lr_micro
      FROM prof
    )
    SELECT dc.doc_id,
           CAST(SUM(dc.c) AS BIGINT) AS n_toks,
           CAST(SUM(dc.c * lr.lr_micro) AS BIGINT) AS score_micro
    FROM dc JOIN lr USING (b)
    GROUP BY dc.doc_id
    """,
)
