"""Round-4 sixth-batch operators: inverted_index, global_shuffle,
cluster_split, hits. Oracle parity is covered by the driver-contract
sweep; these are the behavioral/losslessness/kernel-equality tests."""

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cadastre_pg_spark.operators.corpus import cluster_split, global_shuffle
from cadastre_pg_spark.operators.graph import hits
from cadastre_pg_spark.operators.textanalysis import inverted_index

BASE = "the quick brown fox jumps over the lazy dog near the old stone bridge every morning"


# ---------------------------------------------------- inverted_index ----


def test_inverted_index_exact_tiny_corpus(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a c"),
            (2, "a a a b"),
            (3, "c c d"),
        ],
        "doc_id long, text string",
    )
    rows = inverted_index(docs, k=2, min_df=2).collect()
    by_term = {}
    for r in rows:
        by_term.setdefault(r.term, []).append(r)
    # 'd' (df=1) pruned by min_df=2
    assert set(by_term) == {"a", "b", "c"}
    a = sorted(by_term["a"], key=lambda r: r.rank)
    assert [(r.doc_id, r.tf) for r in a] == [(2, 3), (1, 2)]
    assert a[0].df == 2 and a[0].cf == 5
    c = sorted(by_term["c"], key=lambda r: r.rank)
    assert [(r.doc_id, r.tf) for r in c] == [(3, 2), (1, 1)]
    b = by_term["b"]
    assert {r.doc_id for r in b} == {1, 2}
    # tf tie on 'b' (1 each) -> doc_id ASC breaks it
    assert sorted((r.rank, r.doc_id) for r in b) == [(1, 1), (2, 2)]


def test_inverted_index_salted_topk_is_lossless(spark):
    # 60 docs sharing a hot term with distinct tfs: the salted
    # two-phase rank must return the identical top-k as one window
    rows = [(i, " ".join(["hot"] * (1 + i % 17) + [f"rare{i}", f"rare{i}"])) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for salts in (1, 8):
        got = {
            (r.term, r.rank): (r.doc_id, r.tf, r.df, r.cf)
            for r in inverted_index(docs, k=4, min_df=1, n_salts=salts).collect()
        }
        if salts == 1:
            want = got
    assert got == want
    # and the hot term's df/cf census is over ALL docs, not the cap
    hot = [v for (t, _), v in want.items() if t == "hot"][0]
    assert hot[2] == 60
    assert hot[3] == sum(1 + i % 17 for i in range(60))


def test_inverted_index_min_df_prunes_tail(spark):
    docs = spark.createDataFrame(
        [(i, f"common unique{i}") for i in range(10)],
        "doc_id long, text string",
    )
    out = inverted_index(docs, k=3, min_df=2)
    assert [r.term for r in out.select("term").distinct().collect()] == [
        "common"
    ]


# ---------------------------------------------------- global_shuffle ----


def test_global_shuffle_positions_are_dense_per_shard(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(200)], "doc_id long, text string"
    )
    out = global_shuffle(docs, n_shards=4).collect()
    assert len(out) == 200
    assert {r.doc_id for r in out} == set(range(200))
    by_shard = {}
    for r in out:
        assert r.shard == r.h % 4
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        # 1..n dense positions, ordered by (h, doc_id)
        rows.sort(key=lambda r: r.pos)
        assert [r.pos for r in rows] == list(range(1, len(rows) + 1))
        keys = [(r.h, r.doc_id) for r in rows]
        assert keys == sorted(keys)


def test_global_shuffle_is_deterministic_across_runs(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(100)], "doc_id long, text string"
    )
    a = sorted(map(tuple, global_shuffle(docs, n_shards=8).collect()))
    b = sorted(
        map(tuple, global_shuffle(docs.repartition(13), n_shards=8).collect())
    )
    assert a == b


# ----------------------------------------------------- cluster_split ----


@pytest.fixture(scope="module")
def split_docs(spark):
    rows = []
    for i in range(30):
        words = BASE + f" filler{i} " + " ".join(f"w{i}_{k}" for k in range(10))
        rows.append((i, words))
    for i in range(5):  # planted near-dups of docs 0..4
        rows.append((100 + i, rows[i][1] + " postscript"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cluster_split_near_dups_never_straddle(spark, split_docs):
    out = {r.doc_id: r for r in cluster_split(split_docs, threshold=0.5).collect()}
    assert len(out) == 35
    for i in range(5):
        assert out[100 + i].rep == out[i].rep == i  # min doc_id of component
        assert out[100 + i].split == out[i].split
        assert out[100 + i].u == out[i].u


def test_cluster_split_singletons_split_on_own_id(spark, split_docs):
    from cadastre_pg_spark.operators.corpus import hash_split

    out = {r.doc_id: r for r in cluster_split(split_docs, threshold=0.5).collect()}
    solo = [i for i in range(5, 30)]
    for i in solo:
        assert out[i].rep == i
    # singleton assignment must equal plain doc-level hash_split with
    # the same salt (the ppm CASE chain is shared)
    ref = {
        r.doc_id: r.split
        for r in hash_split(split_docs, salt="cs:").collect()
    }
    for i in solo:
        assert out[i].split == ref[i]


def test_cluster_split_validates_weights(spark, split_docs):
    with pytest.raises(ValueError):
        cluster_split(split_docs, splits=[("a", 0.5), ("b", 0.4)])


# -------------------------------------------------------------- hits ----


def _hits_ref(n, edges, iters, unit=10**14):
    """Single-process replay of the quantized recurrence."""
    h = np.full(n, unit // n, dtype=object)
    a = np.zeros(n, dtype=object)
    for _ in range(iters):
        s = np.zeros(n, dtype=object)
        for u, v in edges:
            s[v] += h[u]
        t = int(s.sum())
        a = np.array(
            [int(np.floor((float(x) / float(t)) * float(unit))) if t > 0 else 0 for x in s],
            dtype=object,
        )
        s = np.zeros(n, dtype=object)
        for u, v in edges:
            s[u] += a[v]
        t = int(s.sum())
        h = np.array(
            [int(np.floor((float(x) / float(t)) * float(unit))) if t > 0 else 0 for x in s],
            dtype=object,
        )
    return h, a


def test_hits_star_graph_shapes(spark):
    # center 0 points at 1..6; 7 points at 0: 0 is the hub, 1..6 the
    # authorities
    edges = [(0, i) for i in range(1, 7)] + [(7, 0)]
    n = 8
    e = spark.createDataFrame(edges, "src long, dst long")
    nd = spark.createDataFrame([(i,) for i in range(n)], "node long")
    out = {r.node: r for r in hits(e, nd, iters=3, n_nodes=n).collect()}
    assert out[0].hub == max(r.hub for r in out.values())
    for i in range(2, 7):
        assert out[i].authority == out[1].authority
    assert out[1].authority > out[0].authority
    # exact match vs the single-process quantized reference
    h_ref, a_ref = _hits_ref(n, edges, 3)
    for i in range(n):
        assert out[i].hub == h_ref[i] / 1e14
        assert out[i].authority == a_ref[i] / 1e14


def test_hits_empty_edges_all_zero(spark):
    e = spark.createDataFrame([], "src long, dst long")
    nd = spark.createDataFrame([(i,) for i in range(4)], "node long")
    out = hits(e, nd, iters=2, n_nodes=4).collect()
    assert len(out) == 4
    assert all(r.hub == 0.0 and r.authority == 0.0 for r in out)


def test_hits_rejects_zero_iters(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    nd = spark.createDataFrame([(0,), (1,)], "node long")
    with pytest.raises(ValueError):
        hits(e, nd, iters=0, n_nodes=2)


# ------------------------------------------------------ linear_score ----


def test_linear_score_exact_hand_weights(spark):
    from cadastre_pg_spark.operators.dedup import shingle_hash32
    from cadastre_pg_spark.operators.textanalysis import linear_score

    docs = spark.createDataFrame(
        [(1, "good good"), (2, "bad")], "doc_id long, text string"
    )
    nb = 64
    # resolve the actual buckets of the features so the test pins
    # exact weights regardless of hash values
    feats = spark.createDataFrame(
        [("good",), ("bad",), ("good good",)], "f string"
    ).select(F.pmod(shingle_hash32(F.col("f"), "xxhash64"), F.lit(nb)).alias("b"))
    b_good, b_bad, b_gg = [r.b for r in feats.collect()]
    wmap = {b_good: 2_000_000, b_bad: -3_000_000, b_gg: 500_000}
    weights = spark.createDataFrame(
        [(b, w) for b, w in wmap.items()], "bucket long, w long"
    )
    out = {
        r.doc_id: r
        for r in linear_score(docs, weights, n_buckets=nb).collect()
    }
    # doc 1: feats good, good, "good good" -> 2 + 2 + 0.5 = 4.5
    assert out[1].n_feats == 3
    assert out[1].logit == pytest.approx(4.5)
    assert out[1].label is True
    # doc 2: single unigram, no bigram
    assert out[2].n_feats == 1
    assert out[2].logit == pytest.approx(-3.0)
    assert out[2].label is False


def test_linear_score_zero_boundary_is_false_and_bias_shifts(spark):
    from cadastre_pg_spark.operators.textanalysis import linear_score

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    weights = spark.createDataFrame([], "bucket long, w long")
    # unmatched bucket scores 0; logit_u = 0 -> label False (strict >)
    r0 = linear_score(docs, weights, n_buckets=16).collect()[0]
    assert r0.logit == 0.0 and r0.label is False
    r1 = linear_score(docs, weights, n_buckets=16, bias_u=1).collect()[0]
    assert r1.label is True


# --------------------------------------------------- classifier_eval ----


def _auc_ref(scores, gold):
    """Tie-corrected Mann-Whitney AUC, single-process."""
    import numpy as np

    s = np.asarray(scores, dtype=float)
    g = np.asarray(gold, dtype=bool)
    pos, neg = s[g], s[~g]
    if len(pos) == 0 or len(neg) == 0:
        return None
    conc = sum((p > neg).sum() for p in pos)
    ties = sum((p == neg).sum() for p in pos)
    return (conc + 0.5 * ties) / (len(pos) * len(neg))


def test_classifier_eval_matches_reference_with_ties(spark):
    from cadastre_pg_spark.operators.stats import classifier_eval

    rng = np.random.RandomState(11)
    scores = np.round(rng.randint(0, 20, 300) / 10.0, 6)  # heavy ties
    gold = (scores + rng.normal(0, 0.8, 300)) > 1.0
    df = spark.createDataFrame(
        [(float(s), bool(g)) for s, g in zip(scores, gold)],
        "score double, gold boolean",
    )
    r = classifier_eval(df, "score", "gold", threshold=1.0, chunk=0.25).collect()[0]
    assert r.n == 300
    assert r.tp == int(((scores > 1.0) & gold).sum())
    assert r.fp == int(((scores > 1.0) & ~gold).sum())
    assert r.auc == pytest.approx(_auc_ref(scores, gold), abs=1e-6)
    p = r.tp / (r.tp + r.fp)
    assert r.prec == pytest.approx(p, abs=1e-6)
    assert r.f1 == pytest.approx(2 * r.tp / (r.tp + r.fp + r.n_pos), abs=1e-6)


def test_classifier_eval_chunking_is_lossless(spark):
    from cadastre_pg_spark.operators.stats import classifier_eval

    rng = np.random.RandomState(3)
    rows = [(round(float(v), 6), bool(v > 0)) for v in rng.normal(0, 2, 200)]
    df = spark.createDataFrame(rows, "score double, gold boolean")
    a = classifier_eval(df, "score", "gold", chunk=0.1).collect()[0]
    b = classifier_eval(df, "score", "gold", chunk=100.0).collect()[0]
    assert a == b
    assert a.auc == 1.0  # perfect separation by construction


def test_classifier_eval_degenerate_single_class(spark):
    from cadastre_pg_spark.operators.stats import classifier_eval

    df = spark.createDataFrame(
        [(float(i), True) for i in range(5)], "score double, gold boolean"
    )
    r = classifier_eval(df, "score", "gold", threshold=2.0).collect()[0]
    assert r.n_neg == 0 and r.auc is None and r.recall == pytest.approx(0.4)


# ---------------------------------------------------- lang_confusion ----


def test_lang_confusion_hand_corpus(spark):
    from cadastre_pg_spark.operators.textanalysis import lang_confusion

    docs = spark.createDataFrame(
        [
            (1, "en", "the cat and the dog of note"),   # -> en
            (2, "en", "le chat la nuit et demain"),      # -> fr (miss)
            (3, "fr", "le chat la nuit et demain"),      # -> fr
            (4, "zh", "no keywords at all here"),        # -> und
        ],
        "doc_id long, lang string, text string",
    )
    out = {r.lang: r for r in lang_confusion(docs).collect()}
    assert set(out) == {"en", "fr", "zh"}
    assert out["en"].n_gold == 2 and out["en"].tp == 1 and out["en"].n_pred == 1
    assert out["en"].prec == 1.0 and out["en"].recall == 0.5
    assert out["fr"].n_pred == 2 and out["fr"].prec == 0.5 and out["fr"].recall == 1.0
    # zh can never be predicted: n_pred 0, prec NULL (stated), recall 0
    assert out["zh"].n_pred == 0 and out["zh"].prec is None
    assert out["zh"].recall == 0.0 and out["zh"].f1 == 0.0


# -------------------------------------------------------- bpe_merges ----


def _bpe_ref(word_counts, k):
    """Single-process Sennrich BPE reference with greedy left-to-right
    merge application and (count desc, lhs, rhs) tie rule."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(k):
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get(
                    (syms[i], syms[i + 1]), 0
                ) + c
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_merges_matches_reference(spark):
    from cadastre_pg_spark.operators.textanalysis import bpe_merges

    rng = np.random.RandomState(5)
    words = ["low", "lower", "lowest", "newer", "newest", "wider", "new"]
    corpus = [words[i] for i in rng.randint(0, len(words), 400)]
    docs = spark.createDataFrame(
        [(i, " ".join(corpus[i * 40 : (i + 1) * 40])) for i in range(10)],
        "doc_id long, text string",
    )
    got = [
        (r.lhs, r.rhs, r.n)
        for r in bpe_merges(docs, k=5).orderBy("rnd").collect()
    ]
    wc = {}
    for w in corpus:
        wc[w] = wc.get(w, 0) + 1
    assert got == _bpe_ref(wc, 5)


def test_bpe_merges_run_parity_on_repeats(spark):
    from cadastre_pg_spark.operators.textanalysis import bpe_merges

    # 'aaaa' x3 + 'aaa': pairs (a,a) count 3*3 + 2 = 11; greedy
    # left-to-right turns aaaa -> (aa)(aa), aaa -> (aa)a
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa aaa")], "doc_id long, text string"
    )
    out = bpe_merges(docs, k=2).orderBy("rnd").collect()
    assert (out[0].lhs, out[0].rhs, out[0].n) == ("a", "a", 11)
    # round 2 operates on [aa, aa] and [aa, a]: (aa,aa) count 3,
    # (aa,a) count 1 -> merge (aa,aa)
    assert (out[1].lhs, out[1].rhs, out[1].n) == ("aa", "aa", 3)
    ref = _bpe_ref({"aaaa": 3, "aaa": 1}, 2)
    assert [(r.lhs, r.rhs, r.n) for r in out] == ref


def test_bpe_merges_rejects_zero_k(spark):
    from cadastre_pg_spark.operators.textanalysis import bpe_merges

    docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bpe_merges(docs, k=0)


# -------------------------------------------------- curriculum_order ----


def test_curriculum_order_rank_is_a_total_interleave(spark):
    from cadastre_pg_spark.operators.corpus import curriculum_order

    docs = spark.createDataFrame(
        [(i, float(i % 100)) for i in range(300)], "doc_id long, score double"
    )
    out = curriculum_order(docs, "score", [25.0, 50.0, 75.0], n_shards=4).collect()
    assert len(out) == 300
    # bucket assignment: # cuts <= score
    for r in out:
        score = r.doc_id % 100
        assert r.bucket == sum(score >= c for c in (25, 50, 75))
    # ranks are distinct (a valid total order)
    ranks = [r.rank for r in out]
    assert len(set(ranks)) == 300
    # rank mod n_buckets recovers the bucket; rank interleaves buckets:
    # consecutive ranks within one (shard,pos) cycle all 4 buckets
    for r in out:
        assert r.rank % 4 == r.bucket
        assert (r.rank // 4) % 4 == r.shard
        assert r.rank // 16 == r.pos - 1


def test_curriculum_order_deterministic_and_dense_positions(spark):
    from cadastre_pg_spark.operators.corpus import curriculum_order

    docs = spark.createDataFrame(
        [(i, float(i)) for i in range(120)], "doc_id long, score double"
    )
    a = sorted(map(tuple, curriculum_order(docs, "score", [60.0], n_shards=3).collect()))
    b = sorted(map(tuple, curriculum_order(docs.repartition(7), "score", [60.0], n_shards=3).collect()))
    assert a == b
    by_part = {}
    for r in curriculum_order(docs, "score", [60.0], n_shards=3).collect():
        by_part.setdefault((r.bucket, r.shard), []).append(r.pos)
    for poss in by_part.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


# ------------------------------------------------------- scrub_spans ----


def test_scrub_spans_cuts_exactly_the_covered_tokens(spark):
    from cadastre_pg_spark.operators.dedup import scrub_spans

    # the repeated 4-token window "x1 x2 x3 x4" appears in docs 1 and
    # 2; everything else is unique
    docs = spark.createDataFrame(
        [
            (1, "a b x1 x2 x3 x4 c d"),
            (2, "e x1 x2 x3 x4 f"),
            (3, "g h i j k l"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in scrub_spans(docs, w=4, min_count=2).collect()}
    assert out[1].text_scrubbed == "a b c d"
    assert out[1].kept_tokens == 4 and out[1].n_tokens == 8
    assert out[2].text_scrubbed == "e f"
    assert out[3].text_scrubbed == "g h i j k l"
    import hashlib

    assert out[2].scrub_sha == hashlib.sha256(b"e f").hexdigest()


def test_scrub_spans_fully_duplicated_doc_empties(spark):
    from cadastre_pg_spark.operators.dedup import scrub_spans

    docs = spark.createDataFrame(
        [(1, "p q r s"), (2, "p q r s")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in scrub_spans(docs, w=4, min_count=2).collect()}
    for i in (1, 2):
        assert out[i].kept_tokens == 0 and out[i].text_scrubbed == ""


def test_scrub_spans_overlapping_windows_merge(spark):
    from cadastre_pg_spark.operators.dedup import scrub_spans

    # "x1..x5" shared: windows at pos 0 and 1 (w=4) overlap; the cut
    # is the union, not double-counted
    docs = spark.createDataFrame(
        [(1, "x1 x2 x3 x4 x5 tail1"), (2, "x1 x2 x3 x4 x5 tail2")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in scrub_spans(docs, w=4, min_count=2).collect()}
    assert out[1].text_scrubbed == "tail1"
    assert out[1].kept_tokens == 1


# --------------------------------------------------------- heaps_law ----


def test_heaps_law_curve_and_exponent(spark):
    from cadastre_pg_spark.operators.textanalysis import heaps_law

    # synthetic Heaps corpus: doc i contributes tokens 'w<j>' for j in
    # [0, 10*(i+1)^0.5): vocab ~ i^0.5 while tokens ~ i^1.5, so
    # V ~ N^(1/3) -> beta ~ 1/3
    rows = []
    for i in range(100):
        hi = int(10 * ((i + 1) ** 0.5))
        rows.append((i, " ".join(f"w{j}" for j in range(hi))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = heaps_law(docs, n_buckets=10).orderBy("bucket").collect()
    assert len(out) == 10
    # cumulative columns are monotone, totals exact
    assert [r.bucket for r in out] == list(range(10))
    assert out[-1].docs_cum == 100
    assert out[-1].tokens_cum == sum(int(10 * ((i + 1) ** 0.5)) for i in range(100))
    assert out[-1].vocab_cum == int(10 * (100 ** 0.5))  # w0..w99 -> max hi
    for a, b in zip(out, out[1:]):
        assert b.tokens_cum >= a.tokens_cum and b.vocab_cum >= a.vocab_cum
    # every row carries the same fit; beta ~ 0.5 by construction
    betas = {r.beta for r in out}
    assert len(betas) == 1
    assert 0.25 < out[0].beta < 0.45


def test_heaps_law_degenerate_fit_is_null(spark):
    from cadastre_pg_spark.operators.textanalysis import heaps_law

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c")], "doc_id long, text string"
    )
    out = heaps_law(docs, n_buckets=2).orderBy("bucket").collect()
    assert len(out) == 2  # only 2 curve points -> k < 3 -> NULL fit
    assert all(r.beta is None and r.lnk is None for r in out)
