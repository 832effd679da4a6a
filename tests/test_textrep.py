"""Gopher-style intra-document repetition signals (operators/textrep):
hand-computed fixtures + a pure-Python differential over the synthetic
documents table, and the gate's compose-with-everything contract."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from yelp_data_engineering_pipeline_spark.operators.textrep import (
    GOPHER_GATES,
    repetition_gate,
    repetition_profile,
)
from yelp_data_engineering_pipeline_spark.tables import load


def _py_profile(text: str) -> dict:
    """The reference implementation, one doc at a time."""
    out = {}
    lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
    lc = Counter(lines)
    tot_lines = sum(lc.values())
    out["dup_line_frac"] = round(
        sum(c - 1 for c in lc.values() if c > 1) / tot_lines, 4
    ) if tot_lines else 0.0
    out["dup_line_char_frac"] = round(
        sum(c * len(ln) for ln, c in lc.items() if c > 1)
        / max(len(text), 1), 4) if tot_lines else 0.0
    words = [w for w in re.split(r"\s+", text.lower()) if w]
    for n in (2, 3, 4, 5):
        grams = [" ".join(words[i:i + n])
                 for i in range(len(words) - n + 1)]
        gc = Counter(grams)
        tot = sum(c * len(g) for g, c in gc.items())
        if not tot:
            if n in (2, 3, 4):
                out[f"top_ngram_char_frac_{n}"] = 0.0
            if n == 5:
                out["dup_ngram_char_frac_5"] = 0.0
            continue
        if n in (2, 3, 4):
            # the single MOST FREQUENT gram (ties by gram string),
            # coverage = that gram's c * len (Gopher §A1.1.3 — NOT the
            # max-coverage gram; ADVICE r12)
            top_c, top_g = max((c, g) for g, c in gc.items())
            out[f"top_ngram_char_frac_{n}"] = round(
                top_c * len(top_g) / tot, 4)
        if n == 5:
            out["dup_ngram_char_frac_5"] = round(
                sum(c * len(g) for g, c in gc.items() if c > 1) / tot,
                4)
    return out


FIXTURES = [
    ("clean", "the quick brown fox\njumps over the lazy dog today"),
    ("menu", "pizza menu\npizza menu\npizza menu\nopening hours"),
    ("loop", ("buy now " * 12).strip()),
    ("empty", "   \n  \n"),
    ("one_word", "hello"),
]


def test_profile_matches_pure_python_on_fixtures(spark):
    df = spark.createDataFrame(FIXTURES, "doc_id string, text string")
    got = {r["doc_id"]: r.asDict()
           for r in repetition_profile(df, "doc_id", "text").collect()}
    assert set(got) == {n for n, _ in FIXTURES}
    for name, text in FIXTURES:
        want = _py_profile(text)
        for col, val in want.items():
            assert got[name][col] == pytest.approx(val, abs=1e-4), (
                name, col, got[name][col], val)
    # the pathological repeats really light up
    assert got["menu"]["dup_line_frac"] >= 0.5
    assert got["loop"]["top_ngram_char_frac_2"] > 0.5
    assert got["loop"]["dup_ngram_char_frac_5"] > 0.9
    # and the clean doc stays near zero on every signal
    assert all(v <= 0.35 for k, v in got["clean"].items()
               if k != "doc_id")


def test_profile_differential_on_documents_table(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(60)
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {r["doc_id"]: r.asDict()
           for r in repetition_profile(docs).collect()}
    assert set(got) == set(rows)
    for did, text in rows.items():
        want = _py_profile(text or "")
        for col, val in want.items():
            assert got[did][col] == pytest.approx(val, abs=1e-4), (
                did, col)


def test_gate_applies_gopher_thresholds(spark):
    df = spark.createDataFrame(FIXTURES, "doc_id string, text string")
    kept = {r["doc_id"]: r["keep_repetition"]
            for r in repetition_gate(df, "doc_id", "text").collect()}
    assert kept["clean"] and kept["empty"] and kept["one_word"]
    assert not kept["menu"] and not kept["loop"]
    # schema contract: original columns ride along
    out = repetition_gate(df, "doc_id", "text")
    assert set(out.columns) == {"doc_id", "text", "keep_repetition"}
    # no row-wise Python anywhere in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # custom (looser) gates flip the decision
    loose = repetition_gate(
        df, "doc_id", "text",
        gates={k: 1.0 for k in GOPHER_GATES})
    assert all(r["keep_repetition"] for r in loose.collect())


def test_profile_sql_twin_matches_column_formulation(spark, sf_dir):
    """repetition_profile builds its words/lines/grams projections from
    SQL strings parsed JVM-side (r13, guide §7.3) instead of ~300 py4j
    round trips of higher-order-function Column construction. The
    verbatim pre-r13 Column formulation below is the equivalence
    oracle: same canonical optimized plan, same rows — in BOTH rounding
    modes (the pytest round-4 plane and the catalog round_to=None
    bit-parity plane)."""
    from yelp_data_engineering_pipeline_spark.operators.textrep import (
        _grams,
        _round_opt,
        _words,
    )

    def gram_fracs_ref(docs, id_col, words_col, n, round_to):
        ex = docs.select(
            F.col(id_col), F.explode(_grams(F.col(words_col), n)).alias("g")
        )
        counts = ex.groupBy(id_col, "g").agg(
            F.count(F.lit(1)).alias("c"),
        )
        per_doc = counts.groupBy(id_col).agg(
            F.max(F.struct(F.col("c"), F.col("g"))).alias("top"),
            F.sum(F.when(F.col("c") > 1, F.col("c") * F.length("g"))
                  .otherwise(F.lit(0))).alias("dup_cov"),
            F.sum(F.col("c") * F.length("g")).alias("tot_cov"),
        )
        top_cov = (F.col("top").getField("c")
                   * F.length(F.col("top").getField("g")))
        return per_doc.select(
            id_col,
            _round_opt(top_cov / F.col("tot_cov"), round_to)
            .alias(f"top_ngram_char_frac_{n}"),
            _round_opt(F.col("dup_cov") / F.col("tot_cov"), round_to)
            .alias(f"dup_ngram_char_frac_{n}"),
        )

    def profile_ref(docs, id_col, text_col, top_ns, dup_ns, round_to):
        base = docs.select(
            F.col(id_col),
            F.col(text_col).alias("_t"),
            _words(F.col(text_col)).alias("_w"),
        )
        lines = F.filter(
            F.transform(F.split(F.col("_t"), r"\n"), lambda l: F.trim(l)),
            lambda l: l != F.lit(""),
        )
        lx = base.select(id_col, F.explode(lines).alias("ln"),
                         F.length(F.col("_t")).alias("_chars"))
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
            prof = gram_fracs_ref(base, id_col, "_w", n, round_to)
            keep = [f"top_ngram_char_frac_{n}"] if n in top_ns else []
            keep += [f"dup_ngram_char_frac_{n}"] if n in dup_ns else []
            out = out.join(prof.select(id_col, *keep), id_col, "left")
        fill = {c: 0.0 for c in out.columns if c != id_col}
        return out.fillna(fill)

    docs = load(spark, sf_dir, "documents")
    for round_to in (4, None):
        ref = profile_ref(docs, "doc_id", "text", (2, 3, 4), (5,), round_to)
        new = repetition_profile(docs, round_to=round_to)
        po = ref._jdf.queryExecution().optimizedPlan().canonicalized().toString()
        pn = new._jdf.queryExecution().optimizedPlan().canonicalized().toString()
        assert po == pn, f"plan mismatch at round_to={round_to}"
        assert sorted(map(tuple, ref.collect())) == sorted(
            map(tuple, new.collect())
        )
