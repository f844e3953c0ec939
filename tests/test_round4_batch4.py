"""Round-4 fourth-batch operators: blocklist_filter, char_entropy,
token_fertility, and line_dedup's group_col (host-boilerplate) mode.
Oracle parity is covered by the driver-contract sweep; these are the
behavioral/known-value/plan tests."""

import math

import pytest
from pyspark.sql import functions as F

from cadastre_pg_spark.operators.corpus import blocklist_filter
from cadastre_pg_spark.operators.dedup import line_dedup
from cadastre_pg_spark.operators.textanalysis import (
    char_entropy,
    token_fertility,
)


# --------------------------------------------------- blocklist_filter ----


def test_blocklist_counts_and_keep(spark):
    docs = spark.createDataFrame(
        [
            (1, "bad worse bad ok fine bad"),  # 3/6 flagged -> drop
            (2, "ok fine good ok fine good ok bad"),  # 1/8 -> keep @200
            (3, "badx xbad embedded notbad"),  # substrings never match
            (4, "bad"),  # 1/1 -> drop
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.asDict()
        for r in blocklist_filter(
            docs, ["bad", "worse"], max_frac_millis=200
        ).collect()
    }
    assert out[1]["n_flagged"] == 4 and out[1]["n_distinct_flagged"] == 2
    assert not out[1]["keep"]
    assert out[2]["n_flagged"] == 1 and out[2]["keep"]
    assert out[3]["n_flagged"] == 0 and out[3]["n_distinct_flagged"] == 0
    assert out[3]["keep"]
    assert out[4]["n_flagged"] == 1 and not out[4]["keep"]


def test_blocklist_boundary_is_exact_integer(spark):
    """keep is n_flagged*1000 <= millis*n_tokens: the boundary case
    (exactly at the threshold) keeps -- no float rounding involved."""
    docs = spark.createDataFrame(
        [(1, "bad ok ok ok ok ok ok ok ok ok")],  # 1/10 = exactly 100
        "doc_id long, text string",
    )
    (r,) = blocklist_filter(docs, ["bad"], max_frac_millis=100).collect()
    assert r.keep


def test_blocklist_rejects_non_word_entries(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        blocklist_filter(docs, ["a|b"])


def test_blocklist_plan_has_no_exchange(spark):
    """The filter is a pure projection: zero shuffles in the plan."""
    docs = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    plan = (
        blocklist_filter(docs, ["bad"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ------------------------------------------------------- char_entropy ----


def test_char_entropy_known_values(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "abcd")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in char_entropy(docs).collect()}
    assert out[1].entropy == pytest.approx(0.0, abs=1e-6)
    assert out[1].n_distinct_chars == 1 and out[1].n_chars_counted == 4
    assert out[2].entropy == pytest.approx(math.log(2), abs=1e-5)
    assert out[3].entropy == pytest.approx(math.log(4), abs=1e-5)
    assert out[3].n_distinct_chars == 4


def test_char_entropy_counts_spaces(spark):
    """Every character participates, including the separator -- the
    signal is about the raw byte stream, not the token stream."""
    docs = spark.createDataFrame([(1, "a a")], "doc_id long, text string")
    (r,) = char_entropy(docs).collect()
    assert r.n_chars_counted == 3 and r.n_distinct_chars == 2
    # counts {a:2, ' ':1}: H = ln3 - (2 ln2)/3
    assert r.entropy == pytest.approx(
        math.log(3) - 2 * math.log(2) / 3, abs=1e-5
    )


# ---------------------------------------------------- token_fertility ----


def test_token_fertility_is_chars_per_pretoken(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", "hello world"),  # [hello][ world] -> 11 chars / 2
            (2, "en", "don't"),  # [don]['t] -> 5 / 2
            (3, "fr", "abc123"),  # [abc][123] -> 6 / 2
        ],
        "doc_id long, lang string, text string",
    )
    out = {r.lang: r for r in token_fertility(docs).collect()}
    assert out["en"].sum_tokens == 4 and out["en"].sum_chars == 16
    assert out["en"].fertility == pytest.approx(4.0)
    assert out["en"].n_docs == 2
    assert out["fr"].fertility == pytest.approx(3.0)


# ----------------------------------------- line_dedup group_col mode ----


def test_host_boilerplate_scopes_census_per_group(spark):
    """A line repeated across docs of ONE host drops there; the same
    line appearing once under another host survives (the global rule
    would have dropped all three occurrences)."""
    chrome = "home about contact"
    docs = spark.createDataFrame(
        [
            (1, "h1", chrome + " alpha beta gamma"),
            (2, "h1", chrome + " delta epsilon zeta"),
            (3, "h2", chrome + " eta theta iota"),
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r.doc_id: r
        for r in line_dedup(
            docs,
            min_docs=2,
            segmenter="tokens",
            seg_tokens=3,
            group_col="source",
        ).collect()
    }
    assert out[1].n_dropped == 1 and out[1].clean_text == "alpha beta gamma"
    assert out[2].n_dropped == 1
    assert out[3].n_dropped == 0 and out[3].clean_text.startswith("home")
    assert out[1].source == "h1" and out[3].source == "h2"


def test_host_boilerplate_within_doc_repeat_does_not_count(spark):
    """Duplicate occurrences inside one document do not reach
    min_docs=2 -- count_distinct(doc_id) semantics hold per group."""
    docs = spark.createDataFrame(
        [(1, "h1", "x y z x y z"), (2, "h1", "a b c d e f")],
        "doc_id long, source string, text string",
    )
    out = {
        r.doc_id: r
        for r in line_dedup(
            docs,
            min_docs=2,
            segmenter="tokens",
            seg_tokens=3,
            group_col="source",
        ).collect()
    }
    assert out[1].n_dropped == 0 and out[2].n_dropped == 0


def test_line_dedup_default_unchanged(spark):
    """group_col=None keeps the original global-census behavior and
    schema (no group column in the output)."""
    docs = spark.createDataFrame(
        [(1, "p q r s"), (2, "p q r t")],
        "doc_id long, text string",
    )
    out = line_dedup(docs, min_docs=2, segmenter="tokens", seg_tokens=3)
    assert out.columns == ["doc_id", "clean_text", "n_kept", "n_dropped"]
    got = {r.doc_id: r.n_dropped for r in out.collect()}
    assert got == {1: 1, 2: 1}
