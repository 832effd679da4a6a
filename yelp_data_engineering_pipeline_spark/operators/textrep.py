"""Intra-document repetition profiling — the Gopher/MassiveText
quality signals (Rae et al. 2021, arXiv:2112.11446 §A1.1.3) a
pretraining pipeline filters on BEFORE any cross-document dedup:
boilerplate-heavy pages repeat the SAME line or n-gram inside one
document, and those chars poison an LM even when the document as a
whole is unique (cross-doc MinHash is blind to them by design).

Per document, the standard signal set:

- ``dup_line_frac``       — duplicate lines / lines;
- ``dup_line_char_frac``  — chars inside duplicate lines / chars;
- ``top_ngram_char_frac_{n}`` (n = 2..4) — chars covered by the single
  MOST FREQUENT word n-gram (headline/menu boilerplate shows up here);
- ``dup_ngram_char_frac_{n}`` (n = 5..10 collapsed to 5) — chars
  covered by word n-grams occurring more than once.

The published thresholds (drop when dup_line_frac > 0.30,
top_2gram > 0.20, … ) are the caller's policy; :func:`repetition_gate`
packages the paper's defaults.

Scale shape: everything is per-document — grams explode to
O(tokens) rows, the counting aggregate is map-side-combined
groupBy((doc, gram)) then one bounded per-doc rollup; no document's
state ever leaves its groups, no driver materialization, no UDF
(split/slice/concat_ws/explode are all whole-stage codegen).

Reference parity note: the reference pipeline (web_scraping.py)
has no text-quality surface at all — this extends the training-data
lane (SURVEY.md §6) beside textstats.text_quality_score, which
measures length/punct/stopword shape but not repetition. Lives in
its own module so the r12 catalog window stays exactly the
verdict-mandated 50; the catalog entries + DuckDB oracles land with
the r13 rotation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import register

# Gopher §A1.1.3 default gates (document is KEPT when every signal is
# at or below its bound)
GOPHER_GATES = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_ngram_char_frac_2": 0.20,
    "top_ngram_char_frac_3": 0.18,
    "top_ngram_char_frac_4": 0.16,
    "dup_ngram_char_frac_5": 0.15,
}


_WS_CLASS = r"[ \t\n\x0b\f\r]+"


def _words(text: Column) -> Column:
    """Lower-cased whitespace tokens, empties dropped (split on a
    run of whitespace emits '' at the edges). Explicit class instead
    of \\s for cross-engine oracle parity (Java \\s includes \\x0b,
    RE2's excludes it — the textstats.whitespace_tokens convention)."""
    return F.filter(
        F.split(F.lower(text), _WS_CLASS),
        lambda w: w != F.lit(""),
    )


def _grams(words: Column, n: int) -> Column:
    """Word n-grams as strings: transform over the valid start
    offsets, slice+concat_ws — one expression, no explode yet."""
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


# --- single-parse SQL twins of the projection expressions (r13, guide
# §7.3): each higher-order-function lambda hop above is a synchronous
# py4j round trip, and repetition_profile builds the gram pipeline for
# FOUR n values — ~1.8 s of serial driver time per profile/gate plan
# construction, zero Spark jobs. Rendering the projections as SQL text
# parsed JVM-side produces the identical tree; the Column builders stay
# as the equivalence oracle (tests/test_textrep.py pins canonical
# optimizedPlan equality and rows). The regex literals double their
# backslashes because the SQL parser processes escape sequences the
# Python raw strings do not.

def _words_sql(text_ref: str) -> str:
    """:func:`_words` as Spark SQL TEXT over a pre-quoted column ref."""
    ws = _WS_CLASS.replace("\\", "\\\\")
    return f"filter(split(lower({text_ref}), '{ws}'), w -> w != '')"


def _grams_sql(words_ref: str, n: int) -> str:
    """:func:`_grams` as Spark SQL TEXT over a pre-quoted column ref."""
    return (
        f"CASE WHEN size({words_ref}) >= {n} THEN "
        f"transform(sequence(1, size({words_ref}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({words_ref}, i, {n}))) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )


_LINES_SQL = "filter(transform(split(_t, '\\\\n'), l -> trim(l)), l -> l != '')"


def _round_opt(c: Column, round_to: int | None) -> Column:
    """ROUND(·, round_to), or the raw IEEE ratio when ``round_to`` is
    None — the bit-parity mode the DuckDB catalog oracles need
    (double rounding of a raw double diverges across engines at
    decimal boundaries; division of identical exact ints does not —
    the textstats.quality_features convention)."""
    return c if round_to is None else F.round(c, round_to)


def _gram_fracs(docs: DataFrame, id_col: str, words_col: str,
                n: int, round_to: int | None = 4) -> DataFrame:
    """Per-doc (top_ngram_char_frac_n, dup_ngram_char_frac_n): explode
    the n-grams, count per (doc, gram) with map-side partials, then
    roll up per doc. ``top`` is the single MOST FREQUENT n-gram
    (Gopher §A1.1.3; ties break to the greatest gram string — fixed
    and engine-portable), and its coverage is that gram's
    c * len(gram) chars (overlaps counted as written), normalized by
    the doc's total gram chars — an internal ratio, so the
    normalization choice cancels out of threshold comparisons.
    (ADVICE r12: an earlier form took the max-COVERAGE gram, letting
    a longer-but-rarer gram inflate the signal past the paper's.)"""
    # single-parse projection (r13): see _grams_sql
    ex = docs.selectExpr(
        f"`{id_col}`", f"explode({_grams_sql(f'`{words_col}`', n)}) AS g"
    )
    counts = ex.groupBy(id_col, "g").agg(
        F.expr("count(1) AS c"),
    )
    per_doc = counts.groupBy(id_col).agg(
        F.expr("max(struct(c, g)) AS top"),
        F.expr("sum(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END)"
               " AS dup_cov"),
        F.expr("sum(c * length(g)) AS tot_cov"),
    )

    def _r(x: str) -> str:
        return x if round_to is None else f"round({x}, {round_to})"

    return per_doc.selectExpr(
        f"`{id_col}`",
        f"{_r('(top.c * length(top.g)) / tot_cov')}"
        f" AS top_ngram_char_frac_{n}",
        f"{_r('dup_cov / tot_cov')} AS dup_ngram_char_frac_{n}",
    )


def repetition_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4), dup_ns: tuple[int, ...] = (5,),
    round_to: int | None = 4,
) -> DataFrame:
    """One row per document with the Gopher repetition signals. A doc
    with no lines/grams at a given n contributes 0.0 for that signal
    (nothing repeats in an empty population — the permissive reading;
    gates only ever DROP on high values)."""
    # single-parse projections (r13): see _words_sql/_LINES_SQL
    base = docs.selectExpr(
        f"`{id_col}`",
        f"`{text_col}` AS _t",
        f"{_words_sql(f'`{text_col}`')} AS _w",
    )
    lx = base.selectExpr(
        f"`{id_col}`",
        f"explode({_LINES_SQL}) AS ln",
        "length(_t) AS _chars",
    )
    lcounts = lx.groupBy(id_col, "ln").agg(
        F.count(F.lit(1)).alias("c"),
        F.length(F.first("ln")).alias("llen"),
        F.first("_chars").alias("chars"),
    )
    line_prof = lcounts.groupBy(id_col).agg(
        _round_opt(
            F.sum(F.when(F.col("c") > 1, F.col("c") - 1).otherwise(0))
            / F.sum("c"), round_to).alias("dup_line_frac"),
        _round_opt(
            F.sum(F.when(F.col("c") > 1, F.col("c") * F.col("llen"))
                  .otherwise(0))
            / F.greatest(F.first("chars"), F.lit(1)), round_to)
        .alias("dup_line_char_frac"),
    )
    out = base.select(id_col).join(line_prof, id_col, "left")
    for n in tuple(top_ns) + tuple(dup_ns):
        prof = _gram_fracs(base, id_col, "_w", n, round_to)
        keep = [f"top_ngram_char_frac_{n}"] if n in top_ns else []
        keep += [f"dup_ngram_char_frac_{n}"] if n in dup_ns else []
        out = out.join(prof.select(id_col, *keep), id_col, "left")
    fill = {c: 0.0 for c in out.columns if c != id_col}
    return out.fillna(fill)


def repetition_gate(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    gates: dict[str, float] | None = None,
    round_to: int | None = 4,
) -> DataFrame:
    """``docs`` plus a boolean ``keep_repetition`` column applying the
    (Gopher-default) thresholds: kept iff EVERY profiled signal is at
    or below its gate. Composes with textstats' quality gate and the
    dedup cascade as one more predicate column."""
    gates = dict(GOPHER_GATES if gates is None else gates)
    prof = repetition_profile(docs, id_col, text_col, round_to=round_to)
    cond = F.lit(True)
    for col, bound in sorted(gates.items()):
        if col in prof.columns:
            cond = cond & (F.coalesce(F.col(col), F.lit(0.0))
                           <= F.lit(float(bound)))
    flag = prof.select(id_col, cond.alias("keep_repetition"))
    return docs.join(flag, id_col, "left").fillna(
        {"keep_repetition": True})


# ---------------------------------------------------------------------------
# Catalog entries (r13 — deferred from r12 when the verification window
# had no free slots): the Gopher repetition profile and gate over the
# documents table, with full DuckDB oracles replaying the line/gram
# arithmetic from the raw text. Emitted UNROUNDED (round_to=None):
# every signal is a single IEEE division of identical exact-integer
# operands on both engines — bit-identical by construction, where
# ROUND(double, 4) is not (see _round_opt).
# ---------------------------------------------------------------------------

_SIGNALS = ("dup_line_frac", "dup_line_char_frac",
            "top_ngram_char_frac_2", "top_ngram_char_frac_3",
            "top_ngram_char_frac_4", "dup_ngram_char_frac_5")

# the engine-portable whitespace class (textstats convention)
_WS = r"[ \t\n\x0b\f\r]+"


def _profile_oracle_cte() -> str:
    """CTE chain computing the unrounded profile per doc_id: lines are
    newline-split + trimmed + de-blanked; words are lowercased
    whitespace tokens; grams per n are slice+join windows; `top` is
    the most frequent gram (ties by gram string — DuckDB's binary
    string order matches Spark's UTF8 struct-max)."""
    parts = [f"""
    base AS (
      SELECT doc_id, text,
             list_filter(
               list_transform(regexp_split_to_array(text, '\\n'),
                              l -> trim(l)),
               l -> l <> '') AS lns,
             list_filter(regexp_split_to_array(lower(text), '{_WS}'),
                         w -> w <> '') AS ws,
             length(text) AS chars
      FROM documents
    ),
    lx AS (
      SELECT doc_id, unnest(lns) AS ln, chars FROM base
    ),
    lcounts AS (
      SELECT doc_id, ln, COUNT(*) AS c, length(ln) AS llen,
             ANY_VALUE(chars) AS chars
      FROM lx GROUP BY doc_id, ln
    ),
    line_prof AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT)
               / CAST(SUM(c) AS BIGINT) AS dup_line_frac,
             CAST(SUM(CASE WHEN c > 1 THEN c * llen ELSE 0 END) AS BIGINT)
               / CAST(GREATEST(ANY_VALUE(chars), 1) AS BIGINT)
               AS dup_line_char_frac
      FROM lcounts GROUP BY doc_id
    )"""]
    for n in (2, 3, 4, 5):
        parts.append(f""",
    gx{n} AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, len(ws) - {n} + 2),
               i -> array_to_string(ws[i:i+{n - 1}], ' '))) AS g
      FROM base
    ),
    gc{n} AS (
      SELECT doc_id, g, COUNT(*) AS c FROM gx{n} GROUP BY doc_id, g
    ),
    gr{n} AS (
      SELECT doc_id, g, c,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY c DESC, g DESC) AS rn
      FROM gc{n}
    ),
    gp{n} AS (
      SELECT doc_id,
             CAST(MAX(CASE WHEN rn = 1 THEN c * length(g) END) AS BIGINT)
               AS top_cov,
             CAST(SUM(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END)
                  AS BIGINT) AS dup_cov,
             CAST(SUM(c * length(g)) AS BIGINT) AS tot_cov
      FROM gr{n} GROUP BY doc_id
    )""")
    parts.append(""",
    prof AS (
      SELECT b.doc_id,
             COALESCE(lp.dup_line_frac, 0.0) AS dup_line_frac,
             COALESCE(lp.dup_line_char_frac, 0.0) AS dup_line_char_frac,
             COALESCE(gp2.top_cov / gp2.tot_cov, 0.0)
               AS top_ngram_char_frac_2,
             COALESCE(gp3.top_cov / gp3.tot_cov, 0.0)
               AS top_ngram_char_frac_3,
             COALESCE(gp4.top_cov / gp4.tot_cov, 0.0)
               AS top_ngram_char_frac_4,
             COALESCE(gp5.dup_cov / gp5.tot_cov, 0.0)
               AS dup_ngram_char_frac_5
      FROM base b
      LEFT JOIN line_prof lp USING (doc_id)
      LEFT JOIN gp2 USING (doc_id)
      LEFT JOIN gp3 USING (doc_id)
      LEFT JOIN gp4 USING (doc_id)
      LEFT JOIN gp5 USING (doc_id)
    )""")
    return "".join(parts)


def text_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher repetition signals over the documents table
    (unrounded — exact-int ratios for engine parity)."""
    from ..tables import load

    return repetition_profile(load(spark, sf_dir, "documents"),
                              round_to=None)


def text_repetition_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The paper-default keep/drop decision per document."""
    from ..tables import load

    out = repetition_gate(load(spark, sf_dir, "documents"),
                          round_to=None)
    return out.select("doc_id", "keep_repetition")


def _gate_pred_sql() -> str:
    return " AND ".join(
        f"COALESCE({col}, 0.0) <= {bound!r}"
        for col, bound in sorted(GOPHER_GATES.items()))


register(
    "text_repetition_profile",
    text_repetition_profile,
    f"""
    WITH {_profile_oracle_cte()}
    SELECT doc_id, {", ".join(_SIGNALS)} FROM prof
    """,
)

register(
    "text_repetition_gate",
    text_repetition_gate,
    f"""
    WITH {_profile_oracle_cte()}
    SELECT doc_id, ({_gate_pred_sql()}) AS keep_repetition FROM prof
    """,
)
