"""repeated_windows / dup_span_stats goldens (exact substring dedup)."""

from cadastre_pg_spark.operators.dedup import dup_span_stats, repeated_windows


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_within_doc_repeat_counts(spark):
    # "a b c d a b c d", w=3: windows abc bcd cda dab abc bcd ->
    # abc and bcd occur twice (within ONE doc), dup positions 0 1 4 5
    df = _docs(spark, [(1, "a b c d a b c d")])
    pos = sorted(
        r.pos for r in repeated_windows(df, w=3).collect()
    )
    assert pos == [0, 1, 4, 5]
    s = dup_span_stats(df, w=3).collect()[0]
    # coverage: [0,1,4,5] -> min(3,1)+min(3,3)+min(3,1)+3 = 8 tokens
    assert (s.n_windows, s.n_dup, s.cut_tokens) == (6, 4, 8)
    assert s.dup_frac == round(4 / 6, 6)


def test_cross_doc_window(spark):
    df = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over"),
            (2, "lazy dogs saw the quick brown fox sleep"),
            (3, "entirely different words here now"),
        ],
    )
    out = {(r.doc_id, r.pos) for r in repeated_windows(df, w=4).collect()}
    # "the quick brown fox" at doc1 pos0 and doc2 pos3 only
    assert out == {(1, 0), (2, 3)}
    stats = {r.doc_id: r for r in dup_span_stats(df, w=4).collect()}
    assert stats[1].cut_tokens == 4 and stats[1].n_dup == 1
    assert stats[2].cut_tokens == 4
    assert stats[3].n_dup == 0 and stats[3].dup_frac == 0.0


def test_short_doc_zero_windows(spark):
    df = _docs(spark, [(1, "too short"), (2, "a b c d e f g h")])
    stats = {r.doc_id: r for r in dup_span_stats(df, w=8).collect()}
    assert stats[1].n_windows == 0 and stats[1].dup_frac == 0.0
    assert stats[2].n_windows == 1 and stats[2].n_dup == 0


def test_adjacent_windows_merge_coverage(spark):
    # two docs share a 5-token run -> with w=4 the run yields two
    # overlapping dup windows each side; union covers 5 tokens
    shared = "v w x y z"
    df = _docs(spark, [(1, f"{shared} p q r"), (2, f"m n {shared}")])
    stats = {r.doc_id: r for r in dup_span_stats(df, w=4).collect()}
    assert stats[1].n_dup == 2 and stats[1].cut_tokens == 5
    assert stats[2].n_dup == 2 and stats[2].cut_tokens == 5


def test_md5_mode_matches_xxhash_semantics(spark):
    df = _docs(spark, [(1, "a b c a b c"), (2, "x y z w")])
    a = {(r.doc_id, r.pos) for r in repeated_windows(df, w=3, hash_fn="md5").collect()}
    b = {(r.doc_id, r.pos) for r in repeated_windows(df, w=3).collect()}
    assert a == b == {(1, 0), (1, 3)}
