"""Round-4 second-batch operators: tfidf_topk, ks_two_sample,
perplexity_buckets, group_minhash_sim, morton_ranges. Oracle parity is
covered by test_driver_contract's registry parametrization; these are
the behavioral/property tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import SF_CORRECT

from cadastre_pg_spark.kernels import cells as C


# ------------------------------------------------------- morton_ranges ----


def test_morton_ranges_cover_equals_rect():
    """The merged ranges expand to exactly the rectangle's cell codes,
    sorted, with no overlaps and maximal merging."""
    level = 6
    lon0, lat0, lon1, lat1 = -1.0, 44.0, 2.0, 47.0
    ranges = C.morton_ranges(lon0, lat0, lon1, lat1, level)
    (ix0,), (iy0,) = C.grid_cell_xy(lon0, lat0, level)
    (ix1,), (iy1,) = C.grid_cell_xy(lon1, lat1, level)
    gx, gy = np.meshgrid(
        np.arange(ix0, ix1 + 1, dtype=np.uint64),
        np.arange(iy0, iy1 + 1, dtype=np.uint64),
    )
    want = np.sort(
        (
            C._part1by1(gx.ravel())
            | (C._part1by1(gy.ravel()) << np.uint64(1))
        ).astype(np.int64)
    )
    got = np.concatenate(
        [np.arange(lo, hi + 1, dtype=np.int64) for lo, hi in ranges]
    )
    assert np.array_equal(got, want)
    # merged: consecutive ranges never touch
    for (_, hi), (lo2, _) in zip(ranges, ranges[1:]):
        assert lo2 > hi + 1


def test_morton_ranges_lossless_on_random_points():
    """Every point inside the bbox lands in a covered code — the
    index filter drops nothing (the oracle-equality claim, replayed
    as a kernel property on random draws)."""
    rng = np.random.default_rng(7)
    level = 6
    lon0, lat0, lon1, lat1 = -1.0, 44.0, 2.0, 47.0
    lon = rng.uniform(lon0, lon1, 5000)
    lat = rng.uniform(lat0, lat1, 5000)
    z = C.morton_cell(lon, lat, level)
    ranges = C.morton_ranges(lon0, lat0, lon1, lat1, level)
    inside = np.zeros(z.shape, dtype=bool)
    for lo, hi in ranges:
        inside |= (z >= lo) & (z <= hi)
    assert inside.all()


# -------------------------------------------------------- ks_two_sample ----


def test_ks_two_sample_hand_case(spark):
    """Tiny case checked by hand: A = {1,2,3}, B = {2,4}. Pooled CDF
    gaps (x n_a*n_b = 6): v=1 -> |1*2-0*3|=2, v=2 -> |2*2-1*3|=1,
    v=3 -> |3*2-1*3|=3, v=4 -> |3*2-2*3|=0. D = 3/6 = 0.5."""
    from cadastre_pg_spark.operators.stats import ks_two_sample

    df = spark.createDataFrame(
        [(1, True), (2, True), (3, True), (2, False), (4, False)],
        "v int, fa boolean",
    )
    row = ks_two_sample(df, "v", "fa").collect()[0]
    assert (row.n_a, row.n_b, row.d_cross) == (3, 2, 3)
    assert row.ks_d == 0.5


def test_ks_two_sample_identical_groups_zero(spark):
    from cadastre_pg_spark.operators.stats import ks_two_sample

    rows = [(v, flag) for v in (1, 2, 3, 4) for flag in (True, False)]
    df = spark.createDataFrame(rows, "v int, fa boolean")
    row = ks_two_sample(df, "v", "fa").collect()[0]
    assert row.d_cross == 0 and row.ks_d == 0.0


# --------------------------------------------------- perplexity_buckets ----


def test_perplexity_buckets_terciles(spark):
    """Per language the three buckets are non-empty and balanced to
    within the interpolation boundary (max-min <= 2 docs), and every
    doc is bucketed exactly once."""
    from cadastre_pg_spark.operators.corpus import perplexity_buckets

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    out = perplexity_buckets(docs, hash_fn="md5")
    assert out.count() == docs.count()
    per = {
        (r.lang, r.bucket): r.n
        for r in out.groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    langs = {l for l, _ in per}
    for lang in langs:
        counts = [per.get((lang, b), 0) for b in ("head", "middle", "tail")]
        assert min(counts) > 0, (lang, counts)
        assert max(counts) - min(counts) <= 2, (lang, counts)


# ---------------------------------------------------- group_minhash_sim ----


def test_group_minhash_sim_identical_groups(spark):
    """Two groups holding the same texts sketch identically: all 32
    positions match, estimate 1.0; a disjoint-vocabulary third group
    matches neither (estimate ~0)."""
    from cadastre_pg_spark.operators.dedup import N_HASHES
    from cadastre_pg_spark.operators.sketches import group_minhash_sim

    texts = ["a b c d e f", "g h i j k l", "m n o p q r"]
    rows = [(i, t, "g1") for i, t in enumerate(texts)]
    rows += [(10 + i, t, "g2") for i, t in enumerate(texts)]
    rows += [(20 + i, t.upper(), "g3") for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r.src_a, r.src_b): r
        for r in group_minhash_sim(docs, "source").collect()
    }
    assert out[("g1", "g2")].matches == N_HASHES
    assert out[("g1", "g2")].jaccard_est == 1.0
    assert out[("g1", "g3")].matches <= 2  # chance collisions only
    assert out[("g2", "g3")].matches <= 2


# ----------------------------------------------------------- tfidf_topk ----


def test_tfidf_topk_tiny_corpus(spark):
    """Hand corpus: 'rare' appears in one doc, 'common' in all —
    rare outranks common everywhere it occurs; rnk is dense 1..k per
    doc over the doc's distinct terms."""
    from cadastre_pg_spark.operators.textanalysis import tfidf_topk

    docs = spark.createDataFrame(
        [
            (1, "common rare common"),
            (2, "common other"),
            (3, "common other other"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_topk(docs, k=2)
    rows = {(r.doc_id, r.rnk): r for r in out.collect()}
    assert rows[(1, 1)].token == "rare"
    assert rows[(1, 2)].token == "common"  # idf 0 but tf 2 beats nothing else
    # doc 2: other (df 2) outranks common (idf 0)
    assert rows[(2, 1)].token == "other"
    # per-doc rnk is 1..min(k, n_terms) with no gaps
    for d in (1, 2, 3):
        rnks = sorted(r for (doc, r) in rows if doc == d)
        assert rnks == list(range(1, len(rnks) + 1))


# ----------------------------------------------------- containment_join ----


def _brute_containment(rows, num, den):
    out = set()
    sets = {i: set(t.split()) for i, t in rows}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a != b and den * len(sa & sb) >= num * len(sa):
                out.add((a, b, len(sa & sb), len(sa), len(sb)))
    return out


def test_containment_equals_brute_force(spark):
    """Lossless asymmetric prefix: engine pairs == all-pairs brute
    force on a corpus with quotes-inside-pages, supersets, disjoint
    docs and exact twins."""
    from cadastre_pg_spark.operators.dedup import containment_join
    from cadastre_pg_spark.operators.spatial_join import release_cached

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "alpha beta gamma delta epsilon"),  # twin of 1
        (4, "zeta eta theta"),
        (5, "completely different words here now"),
        (6, "alpha beta"),
        (7, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = containment_join(docs, 8, 10)
    pairs = {
        (r.a_id, r.b_id, r.inter, r.size_a, r.size_b) for r in got.collect()
    }
    release_cached(got)
    assert pairs == _brute_containment(rows, 8, 10)


def test_containment_wide_vocab_equals_brute_force(spark):
    """Wider-vocabulary corpus (80 tokens, docs are overlapping
    slices) with a twin and an everything-superset; engine pairs ==
    all-pairs brute force."""
    from cadastre_pg_spark.operators.dedup import containment_join
    from cadastre_pg_spark.operators.spatial_join import release_cached

    vocab = [f"w{i:02d}" for i in range(80)]
    rows = []
    for d in range(30):
        lo = (7 * d) % 60
        rows.append((d, " ".join(vocab[lo : lo + 5 + (d % 9)])))
    rows.append((100, rows[4][1]))  # twin of doc 4
    rows.append((101, " ".join(vocab)))  # superset of everything
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = containment_join(docs, 8, 10)
    pairs = {
        (r.a_id, r.b_id, r.inter, r.size_a, r.size_b) for r in got.collect()
    }
    release_cached(got)
    assert pairs == _brute_containment(rows, 8, 10)


def test_containment_clone_groups_equals_brute_force(spark):
    """Degenerate small-vocab corpus (64 tokens, every posting bucket
    ~the whole corpus) with three-way clone groups and a full-vocab
    superset — the shape where prefix pruning is weakest; brute-force
    oracle."""
    from cadastre_pg_spark.operators.dedup import containment_join
    from cadastre_pg_spark.operators.spatial_join import release_cached

    vocab = [f"v{i:02d}" for i in range(64)]  # exactly 64 -> bit 63 used
    rows = []
    for d in range(40):
        lo = (5 * d) % 50
        rows.append((d, " ".join(vocab[lo : lo + 4 + (d % 11)])))
    rows.append((200, rows[7][1]))  # clone pair
    rows.append((201, rows[7][1]))  # three-way clone group
    rows.append((202, " ".join(vocab)))  # the full-vocab superset
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = containment_join(docs, 8, 10)
    pairs = {
        (r.a_id, r.b_id, r.inter, r.size_a, r.size_b) for r in got.collect()
    }
    release_cached(got)
    assert pairs == _brute_containment(rows, 8, 10)


def test_containment_bucket_cap_reports_skips(spark):
    """With max_bucket set on a shared-token corpus, skipped posting
    buckets are reported, never silent."""
    from cadastre_pg_spark.operators.dedup import containment_join
    from cadastre_pg_spark.operators.spatial_join import release_cached

    rows = [(i, f"shared u{i}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = containment_join(docs, 8, 10, max_bucket=8)
    n = got.count()
    skipped = {r.ptok for r in got._skipped_buckets.collect()}
    release_cached(got)
    assert "shared" in skipped
    assert n == 0  # every pair met only at the capped token


def test_containment_hot_token_cap_keeps_rare_token_pairs(spark):
    """Adversarial hot-token shape (the round-5 verdict case): one
    token rare enough to land in prefixes yet present in EVERY doc's
    posting list. With the cap, the hot bucket is skipped and
    reported, but pairs that also share a rare token keep their exact
    containment through the rare bucket — the cap only drops pairs
    whose ONLY meeting point is the capped bucket."""
    from cadastre_pg_spark.operators.dedup import containment_join
    from cadastre_pg_spark.operators.spatial_join import release_cached

    # docs 0/1: identical 5-token sets (containment 1.0 via rare toks);
    # docs 2..41: share only the hot token with everyone
    rows = [(0, "hot r0 r1 r2 r3"), (1, "hot r0 r1 r2 r3")] + [
        (i, f"hot u{i}a u{i}b u{i}c u{i}d") for i in range(2, 42)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = containment_join(docs, 8, 10, max_bucket=16)
    pairs = {(r.a_id, r.b_id): r.containment for r in got.collect()}
    skipped = {r.ptok for r in got._skipped_buckets.collect()}
    release_cached(got)
    assert "hot" in skipped  # 42 > 16: the hot posting bucket is capped
    # the identical pair survives through its rare tokens, exact result
    assert pairs == {(0, 1): 1.0, (1, 0): 1.0}


def test_registry_containment_cap_is_above_test_data(spark):
    """The registry call threads CONT_MAX_BUCKET; at sf0.001 the cap
    must skip nothing (the measured-cap contract: oracle unchanged)."""
    import __spark_entry__ as E
    from cadastre_pg_spark.operators.spatial_join import release_cached

    out = E.queries()["containment_pairs"](spark, "/root/testdata/sf0.001")
    n = out.count()
    assert out._skipped_buckets.count() == 0
    assert n > 0
    release_cached(out)


# ------------------------------------------------------- snapshot_delta ----


def test_snapshot_delta_hand_case(spark):
    from cadastre_pg_spark.operators.corpus import snapshot_delta

    old = spark.createDataFrame(
        [(1, "a", "s"), (2, "b", "s"), (3, "c", "s")],
        "doc_id long, text string, source string",
    )
    new = spark.createDataFrame(
        [(2, "b", "s"), (3, "cc", "s"), (4, "d", "s")],
        "doc_id long, text string, source string",
    )
    got = {
        (r.grp, r.status): r.n
        for r in snapshot_delta(old, new).collect()
    }
    assert got == {
        ("s", "removed"): 1,
        ("s", "same"): 1,
        ("s", "changed"): 1,
        ("s", "added"): 1,
    }


# ---------------------------------------------------------- skew_report ----


def test_skew_report_hand_case(spark):
    from cadastre_pg_spark.operators.stats import skew_report

    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), ("c",), ("c",), ("z",)],
        "k string",
    )
    row = skew_report(df, "k").collect()[0]
    assert (row.n_rows, row.n_keys, row.max_count, row.max_key) == (
        7, 4, 3, "a",
    )
    assert row.sum_sq == 9 + 1 + 4 + 1
    assert row.hhi == 15 / 49


def test_skew_report_max_key_tie_breaks_smallest(spark):
    from cadastre_pg_spark.operators.stats import skew_report

    df = spark.createDataFrame(
        [("b",), ("b",), ("a",), ("a",), ("c",)], "k string"
    )
    row = skew_report(df, "k").collect()[0]
    assert row.max_count == 2 and row.max_key == "a"


# ------------------------------------------------------------ winnowing ----


def _brute_winnow(tokens, k, w):
    """Reference winnowing over one token list: selected (pos, h32)."""
    import hashlib

    grams = [
        " ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)
    ]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
    ]
    sel = set()
    for i in range(len(hs) - w + 1):
        keys = [(hs[j] << 20) + j for j in range(i, i + w)]
        mn = min(keys)
        sel.add((mn & ((1 << 20) - 1), mn >> 20))
    return sel


def test_winnowing_matches_reference(spark):
    from cadastre_pg_spark.operators.dedup import winnowing

    texts = [
        "the quick brown fox jumps over the lazy dog today",
        "pack my box with five dozen liquor jugs right now ok",
        "a a a a a a a a",  # degenerate repeats
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.fpos, r.fph)
        for r in winnowing(docs, 4, 4, hash_fn="md5").collect()
    }
    want = {
        (i, p, h)
        for i, t in enumerate(texts)
        for (p, h) in _brute_winnow(t.split(), 4, 4)
    }
    assert got == want


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """Any shared token run of length >= w + k - 1 yields at least one
    common fingerprint HASH — the MOSS detection guarantee."""
    from cadastre_pg_spark.operators.dedup import winnowing

    shared = "uno dos tres cuatro cinco seis siete"  # 7 = w + k - 1
    docs = spark.createDataFrame(
        [
            (1, "xx yy " + shared + " zz ww qq"),
            (2, "completely other prefix words " + shared),
        ],
        "doc_id long, text string",
    )
    fps = winnowing(docs, 4, 4, hash_fn="md5").collect()
    h1 = {r.fph for r in fps if r.doc_id == 1}
    h2 = {r.fph for r in fps if r.doc_id == 2}
    assert h1 & h2


def test_winnow_pairs_cap_reports_skips(spark):
    from cadastre_pg_spark.operators.dedup import winnow_pairs

    docs = spark.createDataFrame(
        [(i, "same seven words shared by every doc here") for i in range(9)],
        "doc_id long, text string",
    )
    out = winnow_pairs(docs, 4, 4, min_shared=1, max_bucket=4, hash_fn="md5")
    assert out.count() == 0
    assert out._skipped_buckets.count() > 0
