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


# ------------------------------------------------- bloom_contamination ----


def _bloom_docs(spark):
    from cadastre_pg_spark.operators.corpus import _hash32
    # find doc_ids whose 'e:'-salted hash makes them eval under mod 20
    base = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    ).withColumn("e", F.pmod(_hash32(F.col("doc_id"), "e:", "xxhash64"), F.lit(20)))
    rows = base.collect()
    ev = [r.doc_id for r in rows if r.e == 0]
    tr = [r.doc_id for r in rows if r.e != 0]
    return ev, tr


def test_bloom_contamination_flags_shared_grams(spark):
    from cadastre_pg_spark.operators.corpus import bloom_contamination

    ev, tr = _bloom_docs(spark)
    eval_text = "alpha beta gamma delta epsilon"
    dirty = "alpha beta gamma delta zeta"  # shares 2 of its 3 3-grams
    clean = "one two three four five six"
    docs = spark.createDataFrame(
        [(ev[0], eval_text), (tr[0], dirty), (tr[1], clean)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in bloom_contamination(
            docs, n_shingle=3, eval_mod=20, flag_millis=500
        ).collect()
    }
    assert ev[0] not in out  # eval side is not reported
    assert out[tr[0]].n_shingles == 3 and out[tr[0]].n_hits == 2
    assert out[tr[0]].flagged  # 2/3 >= 50%
    assert out[tr[1]].n_hits == 0 and not out[tr[1]].flagged


def test_bloom_contamination_empty_eval_and_short_docs(spark):
    from cadastre_pg_spark.operators.corpus import bloom_contamination

    ev, tr = _bloom_docs(spark)
    docs = spark.createDataFrame(
        [(tr[0], "a b c d"), (tr[1], "xy")],  # no eval docs at all
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in bloom_contamination(docs, n_shingle=3).collect()
    }
    assert out[tr[0]].n_hits == 0 and not out[tr[0]].flagged
    # doc shorter than the shingle width: zero shingles, never flagged
    assert out[tr[1]].n_shingles == 0 and not out[tr[1]].flagged


def test_bloom_positions_fit_bigint(spark):
    """Probe arithmetic must stay exact: max 32-bit hash times the
    largest mixer stays under 2^63 (ANSI mode would error, numpy
    int64 would wrap silently)."""
    from cadastre_pg_spark.operators.corpus import BLOOM_A, BLOOM_B, BLOOM_M

    h_max = (1 << 32) - 1
    for a, b in zip(BLOOM_A, BLOOM_B):
        assert h_max * a + b < (1 << 63)
    assert BLOOM_M < (1 << 20)


# ------------------------------------------------------- label_prop ----


def _lpa_brute(edge_list, iters):
    """Reference synchronous LPA: most-frequent neighbor label, ties
    to the smallest label, isolated nodes keep their label."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edge_list:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    lab = {v: v for v in adj}
    for _ in range(iters):
        new = {}
        for v in adj:
            counts = defaultdict(int)
            for u in adj[v]:
                counts[lab[u]] += 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lab = new
    return lab


def test_label_prop_matches_brute_force(spark):
    from cadastre_pg_spark.operators.graph import label_prop

    # deterministic pseudo-random graph with real community structure:
    # two cliques bridged by one edge, plus a chain
    edges = (
        [(i, j) for i in range(5) for j in range(i + 1, 5)]
        + [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
        + [(4, 10)]
        + [(20, 21), (21, 22), (22, 23)]
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    for iters in (1, 3, 4):
        got = {
            r.node: r.label for r in label_prop(df, iters=iters).collect()
        }
        assert got == _lpa_brute(edges, iters), f"iters={iters}"


def test_label_prop_cliques_converge_to_min_member(spark):
    from cadastre_pg_spark.operators.graph import label_prop

    edges = [(i, j) for i in range(3, 8) for j in range(i + 1, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.label for r in label_prop(df, iters=4).collect()}
    assert set(got.values()) == {3}


def test_label_prop_drops_self_loop_only_nodes(spark):
    from cadastre_pg_spark.operators.graph import label_prop

    df = spark.createDataFrame(
        [(1, 2), (9, 9)], "src long, dst long"
    )
    got = {r.node: r.label for r in label_prop(df, iters=2).collect()}
    assert 9 not in got and set(got) == {1, 2}


# ------------------------------------------------ sorted_neighborhood ----


def test_snm_pairs_within_window_and_block(spark):
    from cadastre_pg_spark.operators.dedup import sorted_neighborhood

    docs = spark.createDataFrame(
        [
            (1, "aa one two"),
            (2, "aa one two three"),
            (3, "aa zzz"),
            (4, "bb other block"),
        ],
        "doc_id long, text string",
    )
    out = sorted_neighborhood(docs, window=1, prefix_len=2).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in out}
    # block 'aa' sort order by normalized key: doc1 < doc2 < doc3
    assert set(pairs) == {(1, 2), (2, 3)}
    assert pairs[(1, 2)].gap == 1
    # jaccard({aa,one,two},{aa,one,two,three}) = 3/4
    assert pairs[(1, 2)].jaccard == pytest.approx(0.75)
    # doc4 is alone in block 'bb': no pair


def test_snm_window_width(spark):
    from cadastre_pg_spark.operators.dedup import sorted_neighborhood

    docs = spark.createDataFrame(
        [(i, f"xx word{i}") for i in range(1, 6)],
        "doc_id long, text string",
    )
    out = sorted_neighborhood(docs, window=2, prefix_len=2).collect()
    # 5 records, window 2: 4 gap-1 pairs + 3 gap-2 pairs
    assert len(out) == 7
    assert sum(1 for r in out if r.gap == 2) == 3


def test_snm_normalization_drives_sort(spark):
    """Case/punctuation variants normalize to adjacent keys and pair
    up even though raw strings sort apart."""
    from cadastre_pg_spark.operators.dedup import sorted_neighborhood

    docs = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello world"), (3, "hzzz different")],
        "doc_id long, text string",
    )
    out = {(r.doc_a, r.doc_b): r for r in
           sorted_neighborhood(docs, window=1, prefix_len=2).collect()}
    assert (1, 2) in out or (2, 1) in out


# --------------------------------------------------------- jl_project ----


def test_jl_project_matches_numpy_and_preserves_distances(spark):
    import numpy as np
    from cadastre_pg_spark.operators.similarity import (
        JL_A,
        JL_B,
        JL_M,
        jl_project,
    )

    rng = np.random.default_rng(7)
    d, n, planes = 32, 40, 16
    mat = rng.normal(size=(n, d)).astype(np.float32)
    embs = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    out = jl_project(embs, n_planes=planes).collect()
    got = np.zeros((n, planes), dtype=np.int64)
    for r in out:
        got[r.vec_id, r.plane] = r.proj
    # replay: quantize then integer plane dot
    m64 = mat.astype(np.float64)
    scale = np.abs(m64).max(axis=1) / 127.0
    codes = np.floor(m64 / scale[:, None] + 0.5).astype(np.int64)
    w = (
        np.arange(planes, dtype=np.int64)[:, None] * JL_A
        + np.arange(d, dtype=np.int64)[None, :] * JL_B
    ) % JL_M - JL_M // 2
    assert np.array_equal(got, codes @ w.T)


def test_jl_project_separates_clusters(spark):
    """The JL property that matters downstream: well-separated
    clusters in the original space stay separated after projection
    (iid-gaussian pairwise distances concentrate, so a rank
    correlation over ALL pairs is noise even for truly random planes
    -- cluster separation is the usable contract)."""
    import numpy as np
    from itertools import combinations
    from cadastre_pg_spark.operators.similarity import jl_project

    rng = np.random.default_rng(11)
    d, per, planes = 32, 8, 16
    centers = rng.normal(size=(3, d)) * 10.0
    pts = np.concatenate(
        [c + rng.normal(size=(per, d)) * 0.3 for c in centers]
    ).astype(np.float32)
    n = len(pts)
    embs = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    got = np.zeros((n, planes), dtype=np.int64)
    for r in jl_project(embs, n_planes=planes).collect():
        got[r.vec_id, r.plane] = r.proj
    lab = np.repeat(np.arange(3), per)
    within, across = [], []
    for i, j in combinations(range(n), 2):
        dist = np.linalg.norm((got[i] - got[j]).astype(np.float64))
        (within if lab[i] == lab[j] else across).append(dist)
    assert max(within) < min(across), (max(within), min(across))


def test_jl_project_zero_vector(spark):
    from cadastre_pg_spark.operators.similarity import jl_project

    embs = spark.createDataFrame(
        [(1, [0.0] * 8)], "vec_id long, embedding array<float>"
    )
    out = jl_project(embs, n_planes=4).collect()
    assert len(out) == 4 and all(r.proj == 0 for r in out)


# ----------------------------------------------------- centroid_drift ----


def test_centroid_drift_identical_group_scores_one(spark):
    """A group whose vectors all equal the global mean direction has
    cosine drift 1; an orthogonal group scores ~0."""
    from cadastre_pg_spark.operators.similarity import centroid_drift

    rows = (
        [(i, [1.0, 0.0, 0.0, 0.0], "a") for i in range(6)]
        + [(10 + i, [0.0, 1.0, 0.0, 0.0], "b") for i in range(2)]
    )
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    out = {r.label: r for r in centroid_drift(embs).collect()}
    # global mean = (0.75, 0.25, 0, 0); cos(a, global) > cos(b, global)
    assert out["a"].cos_drift > 0.9
    assert out["b"].cos_drift < out["a"].cos_drift
    assert out["a"].n_vecs == 6 and out["b"].n_vecs == 2
    # drift is scale-invariant in group size: integer norms positive
    assert out["a"].norm_g_u > 0 and out["a"].norm_all_u > 0


# ----------------------------------------------------------- lang_mix ----


def test_lang_mix_detects_code_switching(spark):
    from cadastre_pg_spark.operators.textanalysis import lang_mix

    en = "the cat and the dog of the house"  # 8 tokens, en keywords
    fr = "le chat et la maison et le jardin"  # 8 tokens, fr keywords
    docs = spark.createDataFrame(
        [
            (1, en + " " + en),  # pure english, 2 chunks
            (2, en + " " + fr),  # half-and-half
            (3, "xx yy zz"),  # no keywords -> und
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lang_mix(docs, seg_tokens=8).collect()}
    assert out[1].n_langs == 1 and out[1].major_lang == "en"
    assert out[1].major_frac == pytest.approx(1.0)
    assert out[2].n_langs == 2
    # tie between en and fr at 1 chunk each -> smallest tag wins
    assert out[2].major_lang == "en" and out[2].major_frac == pytest.approx(0.5)
    assert out[3].major_lang == "und"


def test_lang_mix_tie_breaks_to_smallest_tag(spark):
    from cadastre_pg_spark.operators.textanalysis import lang_mix

    de = "der hund die katze und der"
    fr = "le chat et la maison le"
    docs = spark.createDataFrame(
        [(1, de + " " + fr)], "doc_id long, text string"
    )
    (r,) = lang_mix(docs, seg_tokens=6).collect()
    assert r.n_chunks == 2 and r.major_lang == "de"  # de < fr


# ------------------------------------------------ temperature_mixture ----


def test_temperature_mixture_upsamples_small_groups(spark):
    """At alpha=0.5 the keep-RATE of a small language exceeds the big
    language's rate (sqrt flattens shares), while expected token mass
    stays near the budget split sqrt(t_g)/sum sqrt."""
    from cadastre_pg_spark.operators.corpus import temperature_mixture

    rows = [(i, "big", "w " * 20) for i in range(400)] + [
        (1000 + i, "sml", "w " * 20) for i in range(25)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )
    out = temperature_mixture(docs, token_budget=4000).collect()
    kept = {"big": 0, "sml": 0}
    for r in out:
        kept[r.grp] += 1
    rate_big, rate_sml = kept["big"] / 400, kept["sml"] / 25
    assert rate_sml > rate_big
    # sqrt shares: sqrt(8000):sqrt(500) = 4:1 of a 4000-token budget
    # -> sml target 800 tokens = 40 docs > its 25 -> rate capped at 1
    assert kept["sml"] == 25
    assert 0 < kept["big"] < 400


def test_temperature_mixture_deterministic(spark):
    from cadastre_pg_spark.operators.corpus import temperature_mixture

    rows = [(i, "a" if i % 3 else "b", "t " * (5 + i % 7)) for i in range(90)]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )
    a = sorted(r.doc_id for r in temperature_mixture(docs, 300).collect())
    b = sorted(r.doc_id for r in temperature_mixture(docs, 300).collect())
    assert a == b and len(a) > 0


# --------------------------------------------------------- url_filter ----


def test_url_filter_rules_and_reasons(spark):
    from cadastre_pg_spark.operators.corpus import url_filter

    urls = spark.createDataFrame(
        [
            (1, "https://a.example.org/page.html"),
            (2, "https://a.example.org/img/photo.JPG"),  # ext (lowercased)
            (3, "https://a.example.org/a/b/c/d/e/f/g/h.html"),  # depth 8
            (4, "https://a.example.org/p?sid=" + "y" * 40),  # query 44
            (5, "https://a.example.org/doc.pdf?x=1"),  # ext before query
            (6, "https://a.example.org/"),  # bare root
            (7, "https://a.example.org/x.html#frag"),  # fragment stripped
        ],
        "page_id long, url string",
    )
    out = {r.page_id: r for r in url_filter(urls).collect()}
    assert out[1].keep and out[1].reason == "ok" and out[1].ext == "html"
    assert not out[2].keep and out[2].reason == "ext"
    assert not out[3].keep and out[3].reason == "depth"
    assert out[3].path_depth == 8
    assert not out[4].keep and out[4].reason == "query"
    assert out[4].query_len == 44
    assert not out[5].keep and out[5].reason == "ext" and out[5].ext == "pdf"
    assert out[6].keep and out[6].path_depth == 0
    assert out[7].keep and out[7].ext == "html"


def test_url_filter_plan_has_no_exchange(spark):
    from cadastre_pg_spark.operators.corpus import url_filter

    urls = spark.createDataFrame(
        [(1, "https://h/x")], "page_id long, url string"
    )
    plan = (
        url_filter(urls)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# -------------------------------------------------- poisson_bootstrap ----


def test_poisson_bootstrap_brackets_the_mean(spark):
    """CI brackets the point estimate, tightens with group size, and
    weight draws reproduce exactly across runs."""
    from cadastre_pg_spark.operators.stats import poisson_bootstrap

    rows = [(i, "big", 10.0 + (i % 7)) for i in range(4000)] + [
        (10_000 + i, "small", 10.0 + (i % 7)) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "event_id long, grp string, value double")
    out = {
        r.grp: r
        for r in poisson_bootstrap(
            df, "grp", "value", "event_id", n_reps=40
        ).collect()
    }
    for g in ("big", "small"):
        assert out[g].boot_lo <= out[g].mean <= out[g].boot_hi, out[g]
    width_big = out["big"].boot_hi - out["big"].boot_lo
    width_small = out["small"].boot_hi - out["small"].boot_lo
    assert width_big < width_small  # sqrt(n) shrinkage
    # determinism
    out2 = {
        r.grp: r
        for r in poisson_bootstrap(
            df, "grp", "value", "event_id", n_reps=40
        ).collect()
    }
    assert out == out2


def test_poisson_bootstrap_single_exchange(spark):
    """One group-key aggregate, no explode: the plan has exactly one
    hash exchange and no generator."""
    from cadastre_pg_spark.operators.stats import poisson_bootstrap
    from cadastre_pg_spark.plans.audit import explain_string

    df = spark.createDataFrame(
        [(1, "a", 1.0)], "event_id long, grp string, value double"
    )
    s = explain_string(
        poisson_bootstrap(df, "grp", "value", "event_id", n_reps=8)
    )
    assert s.count("Exchange") <= 2, s[:2000]  # shuffle (+AQE reuse line)
    assert "Generate" not in s


def test_poisson_bootstrap_validates_trim(spark):
    from cadastre_pg_spark.operators.stats import poisson_bootstrap

    df = spark.createDataFrame(
        [(1, "a", 1.0)], "event_id long, grp string, value double"
    )
    with pytest.raises(ValueError):
        poisson_bootstrap(df, "grp", "value", "event_id", n_reps=4, k_trim=2)


# ------------------------------------------------------------ ab_test ----


def test_ab_test_null_effect_and_injected_lift(spark):
    """Arms from the unit hash split a null effect to |z| small; an
    injected lift on arm A pushes z positive and large."""
    from cadastre_pg_spark.operators.corpus import _hash32
    from cadastre_pg_spark.operators.stats import ab_test

    base = spark.createDataFrame(
        [(i, i % 97, "m", float(10 + (i % 5))) for i in range(4000)],
        "event_id long, user_id long, grp string, value double",
    )
    (null_row,) = ab_test(base, "grp", "value", "user_id").collect()
    assert abs(null_row.z) < 3.0
    assert null_row.n_a + null_row.n_b == 4000
    # inject +2.0 on arm A (using the same salted hash the op uses)
    arm = F.pmod(_hash32(F.col("user_id"), "ab:", "xxhash64"), F.lit(2)) == 0
    lifted = base.withColumn(
        "value", F.when(arm, F.col("value") + F.lit(2.0)).otherwise(F.col("value"))
    )
    (row,) = ab_test(lifted, "grp", "value", "user_id").collect()
    assert row.diff == pytest.approx(2.0, abs=0.2)
    assert row.z > 10.0


def test_ab_test_degenerate_arms_define_zero(spark):
    from cadastre_pg_spark.operators.stats import ab_test

    df = spark.createDataFrame(
        [(1, 1, "g", 5.0)], "event_id long, user_id long, grp string, value double"
    )
    (r,) = ab_test(df, "grp", "value", "user_id").collect()
    assert r.z == 0.0


# ---------------------------------------------------------------- ppr ----


def test_ppr_mass_concentrates_near_seeds(spark):
    """On a two-cluster graph with the seed in cluster 1, cluster-1
    nodes outrank cluster-2 nodes; global pagerank would not separate
    the symmetric clusters."""
    from cadastre_pg_spark.operators.graph import personalized_pagerank

    c1 = [(i, j) for i in range(5) for j in range(5) if i != j]
    c2 = [(10 + i, 10 + j) for i in range(5) for j in range(5) if i != j]
    bridge = [(4, 10), (10, 4)]
    edges = spark.createDataFrame(c1 + c2 + bridge, "src long, dst long")
    nodes = spark.createDataFrame(
        [(v,) for v in list(range(5)) + list(range(10, 15))], "node long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    out = {
        r.node: r.rank
        for r in personalized_pagerank(edges, nodes, seeds, iters=6).collect()
    }
    assert min(out[v] for v in range(5)) > max(out[v] for v in range(11, 15))


def test_ppr_requires_seeds(spark):
    from cadastre_pg_spark.operators.graph import personalized_pagerank

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    n = spark.createDataFrame([(1,), (2,)], "node long")
    s = spark.createDataFrame([], "node long")
    with pytest.raises(ValueError):
        personalized_pagerank(e, n, s)


# ----------------------------------------------------- retrieval_eval ----


def test_retrieval_eval_known_ranking(spark):
    from cadastre_pg_spark.operators.textanalysis import retrieval_eval

    docs = spark.createDataFrame(
        [
            (1, "alpha beta filler filler filler"),  # relevant, high tf
            (2, "alpha filler beta alpha beta"),  # relevant, higher tf
            (3, "alpha alpha alpha filler filler"),  # not relevant (no beta)
            (4, "other words entirely here now"),
            (5, "beta alpha padding x y"),  # relevant
        ],
        "doc_id long, text string",
    )
    (r,) = retrieval_eval(docs, ["alpha", "beta"], k=2).collect()
    assert r.n_relevant == 3
    assert r.first_rel_rank == 1 and r.mrr == pytest.approx(1.0)
    # only 2 slots for 3 relevant docs -> recall 2/3
    assert r.recall_at_k == pytest.approx(2 / 3, abs=1e-6)


def test_retrieval_eval_no_relevant_defines_misses(spark):
    from cadastre_pg_spark.operators.textanalysis import retrieval_eval

    docs = spark.createDataFrame(
        [(1, "nothing matches here"), (2, "still nothing")],
        "doc_id long, text string",
    )
    (r,) = retrieval_eval(docs, ["absent", "terms"], k=5).collect()
    assert r.n_relevant == 0 and r.first_rel_rank == 0
    assert r.mrr == 0.0 and r.recall_at_k == 0.0


def test_retrieval_eval_topk_plan_uses_take_ordered(spark):
    """No global row_number over the corpus: the ranking arrives via
    TakeOrderedAndProject."""
    from cadastre_pg_spark.operators.textanalysis import retrieval_eval
    from cadastre_pg_spark.plans.audit import explain_string

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a c")], "doc_id long, text string"
    )
    s = explain_string(retrieval_eval(docs, ["a"], k=2), mode="simple")
    assert "TakeOrderedAndProject" in s, s[:2000]
