"""Round-5 operators: bleu_eval (and later additions). Oracle parity
is covered by the registry sweep; these are behavioral goldens and
degenerate-input checks."""

import math

from cadastre_pg_spark.operators.textanalysis import bleu_eval


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in bleu_eval(df).collect()}
    return out


def test_bleu_identical_text_scores_one(spark):
    # all-lowercase alphanumeric text: normalization is a no-op
    out = _run(spark, [(1, "the cat sat on the mat")])
    r = out[1]
    assert r["ref_len"] == r["hyp_len"] == 6
    assert r["p1_num"] == 6 and r["p2_num"] == 5
    assert r["bleu2"] == 1.0


def test_bleu_hand_computed_golden(spark):
    # ref: "The cat, sat." -> tokens [The, cat,, sat.]
    # hyp: lower+strip    -> tokens [the, cat, sat]
    # unigram clip: no surface forms match -> p1_num 0 -> bleu 0
    out = _run(spark, [(1, "The cat, sat.")])
    r = out[1]
    assert r["ref_len"] == 3 and r["hyp_len"] == 3
    assert r["p1_num"] == 0 and r["bleu2"] == 0.0

    # partial overlap with a brevity penalty:
    # ref: "aa bb. cc dd" -> [aa, bb., cc, dd]   (4 tokens)
    # hyp:                -> [aa, bb, cc, dd] -> wait, "bb." -> "bb "
    # -> [aa, bb, cc, dd]  (4 tokens, no BP)
    # uni clip: aa,cc,dd match = 3; bigrams ref {aa bb., bb. cc, cc dd}
    # hyp {aa bb, bb cc, cc dd} -> only "cc dd" matches = 1
    out = _run(spark, [(2, "aa bb. cc dd")])
    r = out[2]
    assert (r["ref_len"], r["hyp_len"]) == (4, 4)
    assert (r["p1_num"], r["p2_num"]) == (3, 1)
    want = round(math.sqrt((3 / 4) * (1 / 3)), 6)
    assert r["bleu2"] == want


def test_bleu_brevity_penalty(spark):
    # ref: "aa !! bb" -> [aa, !!, bb] (3); hyp -> "aa   bb" -> [aa, bb]
    # hyp shorter: BP = exp(1 - 3/2); p1 = 2/2, p2: ref bigrams
    # {aa !!, !! bb}, hyp {aa bb} -> 0 matches -> bleu 0 by the gate
    out = _run(spark, [(1, "aa !! bb")])
    r = out[1]
    assert (r["ref_len"], r["hyp_len"]) == (3, 2)
    assert r["p2_num"] == 0 and r["bleu2"] == 0.0

    # engineered non-zero BP case:
    # ref "xx yy zz ?? yy zz" -> 6 toks; hyp -> [xx, yy, zz, yy, zz] 5
    # uni clip: xx 1, yy 2, zz 2 -> 5; bigrams ref {xx yy, yy zz x2,
    # zz ??, ?? yy}, hyp {xx yy, yy zz, zz yy, yy zz} ->
    # clip: xx yy 1, yy zz min(2,2)=2 -> 3
    out = _run(spark, [(2, "xx yy zz ?? yy zz")])
    r = out[2]
    assert (r["ref_len"], r["hyp_len"]) == (6, 5)
    assert (r["p1_num"], r["p2_num"]) == (5, 3)
    want = round(math.exp(1 - 6 / 5) * math.sqrt((5 / 5) * (3 / 4)), 6)
    assert r["bleu2"] == want


def test_bleu_degenerate_inputs(spark):
    # empty, whitespace-only, all-punctuation, single-token docs must
    # neither raise (ANSI 0/0) nor emit non-zero scores
    out = _run(
        spark,
        [(1, ""), (2, "   "), (3, "?!...;;"), (4, "word")],
    )
    assert out[1]["ref_len"] == 0 and out[1]["bleu2"] == 0.0
    assert out[2]["ref_len"] == 0 and out[2]["bleu2"] == 0.0
    # all-punct: ref keeps the blob as one token, hyp strips to empty
    assert out[3]["ref_len"] == 1 and out[3]["hyp_len"] == 0
    assert out[3]["bleu2"] == 0.0
    assert out[4]["hyp_len"] == 1 and out[4]["bleu2"] == 0.0


def test_source_kl_hand_computed(spark):
    from cadastre_pg_spark.operators.corpus import source_kl_divergence

    # corpus: 2 sources; vocab {aa,bb,cc}; counts:
    #   s1: aa x2, bb x1 (N=3, T=2);  s2: aa x1, cc x2 (N=3, T=2)
    # corpus: aa 3, bb 1, cc 2; N=6, V=3
    docs = spark.createDataFrame(
        [
            (1, "aa aa bb", "s1"),
            (2, "aa cc cc", "s2"),
            (3, "   ", "s3"),  # token-free source -> absent
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r["source"]: r.asDict()
        for r in source_kl_divergence(docs).collect()
    }
    assert set(out) == {"s1", "s2"}

    lnu = lambda x: round(math.log(x) * 1e6)
    V, N = 3, 6
    corpus = {"aa": 3, "bb": 1, "cc": 2}
    l_all = sum(lnu(c) for c in corpus.values())

    def expect(cs):
        n_s = sum(cs.values())
        d = n_s + V
        a = sum(
            (c + 1) * (lnu(c + 1) - lnu(corpus[t])) for t, c in cs.items()
        )
        l = sum(lnu(corpus[t]) for t in cs)
        kl_num = a + l - l_all + d * (lnu(N) - lnu(d))
        return kl_num, (float(kl_num) / float(d)) / 1e6

    for s, cs in (("s1", {"aa": 2, "bb": 1}), ("s2", {"aa": 1, "cc": 2})):
        num, nats = expect(cs)
        r = out[s]
        assert (r["n_tokens"], r["n_types"]) == (3, 2)
        assert r["kl_num"] == num
        assert r["kl_nats"] == nats
        # the quantized KL must agree with true float KL to ~1e-5
        q = {
            t: (cs.get(t, 0) + 1) / (3 + V) for t in corpus
        }
        p = {t: c / N for t, c in corpus.items()}
        true_kl = sum(q[t] * math.log(q[t] / p[t]) for t in corpus)
        assert abs(r["kl_nats"] - true_kl) < 1e-5
        assert r["kl_nats"] >= 0.0  # KL(q||p) >= 0 for distributions


def test_location_entropy_golden(spark):
    from cadastre_pg_spark.operators.measures import location_entropy

    pts = spark.createDataFrame(
        [
            (1, 10), (1, 10), (1, 10), (1, 10),  # all one cell -> H = 0
            (2, 10), (2, 20),                     # 2 cells evenly -> ln 2
            (3, 10), (3, 10), (3, 20), (3, 30),  # mixed
        ],
        "user_id long, cell long",
    )
    out = {
        r["user_id"]: r.asDict() for r in location_entropy(pts).collect()
    }
    lnu = lambda x: round(math.log(x) * 1e6)
    assert out[1]["ent_u"] == 0 and out[1]["ent_nats"] == 0.0
    assert out[1]["n_cells"] == 1

    e2 = 2 * lnu(2) - 2 * lnu(1)
    assert out[2]["ent_u"] == e2
    assert abs(out[2]["ent_nats"] - math.log(2)) < 1e-5

    e3 = 4 * lnu(4) - (2 * lnu(2) + lnu(1) + lnu(1))
    assert out[3]["ent_u"] == e3
    true_h = -(0.5 * math.log(0.5) + 2 * 0.25 * math.log(0.25))
    assert abs(out[3]["ent_nats"] - true_h) < 1e-5
    assert out[3]["ent_nats"] == (float(e3) / 4.0) / 1e6


def test_source_kl_single_source_smoothing_floor(spark):
    """One source == the corpus: divergence comes only from add-one
    smoothing — tiny but non-negative, and exactly reproducible."""
    from cadastre_pg_spark.operators.corpus import source_kl_divergence

    docs = spark.createDataFrame(
        [(1, "aa aa bb", "s1"), (2, "aa cc", "s1")],
        "doc_id long, text string, source string",
    )
    r = source_kl_divergence(docs).collect()[0].asDict()
    assert r["source"] == "s1"
    assert (r["n_tokens"], r["n_types"]) == (5, 3)
    assert r["kl_nats"] >= 0.0
    # q = (c+1)/(5+3) vs p = c/5 over {aa:3, bb:1, cc:1}
    true_kl = sum(
        ((c + 1) / 8.0) * math.log(((c + 1) / 8.0) / (c / 5.0))
        for c in (3, 1, 1)
    )
    assert abs(r["kl_nats"] - true_kl) < 1e-5
