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
