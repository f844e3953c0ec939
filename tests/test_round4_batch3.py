"""Round-4 third-batch operators: chunk_docs, norm_dedup,
skipgram_pmi. Oracle parity is covered by test_driver_contract's
registry parametrization; these are the behavioral/property tests."""

import pytest
from pyspark.sql import functions as F

from cadastre_pg_spark.operators.corpus import chunk_docs
from cadastre_pg_spark.operators.dedup import norm_dedup
from cadastre_pg_spark.operators.textanalysis import skipgram_pmi


# --------------------------------------------------------- chunk_docs ----


def _chunks_brute(n, cs, st):
    if n <= cs:
        return [(0, 0, min(cs, n))]
    k = -((n - cs) // -st) + 1  # ceil div
    return [(i, i * st, min(cs, n - i * st)) for i in range(k)]


def test_chunk_docs_grid_matches_brute_force(spark):
    """Chunk index/offset/length match the HF overflow rule for every
    length around the boundaries (n <= cs, exact multiples, one-over)."""
    cs, st = 8, 5
    rows = [
        (n, " ".join(f"w{i}" for i in range(n)))
        for n in [1, 7, 8, 9, 12, 13, 14, 18, 23, 40]
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_id): (r.start, r.chunk_tokens)
        for r in chunk_docs(docs, cs, st).collect()
    }
    want = {}
    for n, _ in rows:
        for cid, start, ln in _chunks_brute(n, cs, st):
            want[(n, cid)] = (start, ln)
    assert got == want


def test_chunk_docs_covers_every_token(spark):
    """Union of chunk spans covers [0, n) with no gaps, and every
    adjacent pair overlaps by exactly chunk_size - stride (except a
    short tail)."""
    cs, st = 8, 5
    docs = spark.createDataFrame(
        [(n, " ".join(f"w{i}" for i in range(n))) for n in range(1, 60)],
        "doc_id long, text string",
    )
    rows = chunk_docs(docs, cs, st).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.start, r.chunk_tokens))
    for n, spans in by_doc.items():
        spans.sort()
        covered = set()
        for s, ln in spans:
            assert ln >= 1
            covered |= set(range(s, s + ln))
        assert covered == set(range(n))


def test_chunk_docs_hash_is_content_addressable(spark):
    """Chunks with identical token slices share chunk_h across docs."""
    text = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    rows = chunk_docs(docs, 4, 4).collect()
    h1 = {r.chunk_id: r.chunk_h for r in rows if r.doc_id == 1}
    h2 = {r.chunk_id: r.chunk_h for r in rows if r.doc_id == 2}
    assert h1 == h2 and len(h1) == 3


def test_chunk_docs_rejects_bad_params(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_docs(docs, 4, 5)
    with pytest.raises(ValueError):
        chunk_docs(docs, 4, 0)


# --------------------------------------------------------- norm_dedup ----


def test_norm_dedup_merges_renderings(spark):
    """Case / punctuation / whitespace re-renders of the same page are
    one group; genuinely different text is not."""
    docs = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello world"),
            (3, "  HELLO   world.  "),
            (4, "hello worlds"),
        ],
        "doc_id long, text string",
    )
    rows = {r.keep_doc_id: r for r in norm_dedup(docs).collect()}
    assert set(rows) == {1, 4}
    assert rows[1].n_copies == 3
    assert rows[1].n_raw_variants == 3
    assert rows[4].n_copies == 1


def test_norm_dedup_counts_raw_variants_not_rows(spark):
    """Byte-identical copies collapse in n_raw_variants but not in
    n_copies."""
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "A   b")],
        "doc_id long, text string",
    )
    r = norm_dedup(docs).collect()
    assert len(r) == 1 and r[0].n_copies == 3 and r[0].n_raw_variants == 2


# ------------------------------------------------------- skipgram_pmi ----


def test_skipgram_matches_brute_force(spark):
    """Pair census equals the positional brute force for window=2."""
    texts = ["a b c a b", "b c d", "a a a"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    window, mc = 2, 1
    brute = {}
    for t in texts:
        ws = t.split()
        for i in range(len(ws)):
            for d in range(1, window + 1):
                if i + d < len(ws):
                    k = (ws[i], ws[i + d])
                    brute[k] = brute.get(k, 0) + 1
    got = {
        (r.a, r.b): r.n_ab
        for r in skipgram_pmi(docs, window=window, min_count=mc).collect()
    }
    assert got == brute


def test_skipgram_window1_equals_collocations_census(spark):
    """window=1 degenerates to the adjacent-bigram census."""
    from cadastre_pg_spark.operators.textanalysis import collocations

    docs = spark.createDataFrame(
        [(1, "x y x y z"), (2, "y z y")], "doc_id long, text string"
    )
    sg = {
        (r.a, r.b): (r.n_ab, r.pmi_u)
        for r in skipgram_pmi(docs, window=1, min_count=1).collect()
    }
    co = {
        (r.a, r.b): (r.n_ab, r.pmi_u)
        for r in collocations(docs, min_count=1).collect()
    }
    assert sg == co
