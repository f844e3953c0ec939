"""Corpus-assembly operators: packing, sampling, contamination."""

import hashlib

import pytest
from pyspark.sql import functions as F

from cadastre_pg_spark.operators.corpus import (
    MILLION,
    contamination,
    group_sample,
    pack_tokens,
    stratified_sample,
)


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(3 + i % 40)),
         ["en", "fr", "de"][i % 3])
        for i in range(300)
    ]
    return _docs(spark, rows).persist()


def test_pack_tokens_matches_sequential_replay(corpus):
    cap, nw = 64, 4
    got = {
        r.doc_id: (r.writer, r.shard, r.offset, r.n_tokens, r.spans_boundary)
        for r in pack_tokens(corpus, capacity=cap, n_writers=nw, hash_fn="md5").collect()
    }
    # replay the packing single-threaded from first principles
    rows = sorted(
        (r.doc_id, len(r.text.split()), _md5_32(f"w:{r.doc_id}") % nw)
        for r in corpus.collect()
    )
    cum = dict.fromkeys(range(nw), 0)
    for doc_id, n_tok, writer in rows:
        start = cum[writer]
        cum[writer] += n_tok
        shard = start // cap
        spans = int(start + n_tok - 1 >= (shard + 1) * cap)
        assert got[doc_id] == (writer, shard, start - shard * cap, n_tok, spans), doc_id
    assert len(got) == len(rows)


def test_pack_tokens_stable_under_repartition(corpus):
    a = pack_tokens(corpus, capacity=128, n_writers=8, hash_fn="md5")
    b = pack_tokens(corpus.repartition(13), capacity=128, n_writers=8, hash_fn="md5")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_stratified_sample_rates(corpus):
    out = stratified_sample(
        corpus, {"en": 1.0, "fr": 0.5, "de": 0.0}, hash_fn="md5"
    ).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.stratum, set()).add(r.doc_id)
    n_en = corpus.filter(F.col("lang") == "en").count()
    assert len(by_lang.get("en", ())) == n_en  # rate 1.0 keeps all
    assert "de" not in by_lang  # rate 0.0 drops all
    # fr kept iff md5 bucket under threshold — exact replay
    fr_expected = {
        r.doc_id
        for r in corpus.filter(F.col("lang") == "fr").collect()
        if _md5_32(f"s:{r.doc_id}") % MILLION < 500_000
    }
    assert by_lang.get("fr", set()) == fr_expected
    assert 0 < len(fr_expected) < corpus.filter(F.col("lang") == "fr").count()


def test_group_sample_exact_topk(corpus):
    k = 7
    got = {(r.doc_id, r.stratum, r.rank) for r in group_sample(corpus, k, hash_fn="md5").collect()}
    rows = [(r.doc_id, r.lang, _md5_32(f"g:{r.doc_id}")) for r in corpus.collect()]
    want = set()
    for lang in {"en", "fr", "de"}:
        members = sorted(((h, d) for d, lg, h in rows if lg == lang))
        want |= {(d, lang, i + 1) for i, (h, d) in enumerate(members[:k])}
    assert got == want


def test_group_sample_prune_path_identical(corpus):
    k = 5
    plain = sorted(map(tuple, group_sample(corpus, k, hash_fn="md5").collect()))
    pruned = sorted(
        map(
            tuple,
            group_sample(
                corpus, k, hash_fn="md5", prune_min_group=1, oversample=8.0
            ).collect(),
        )
    )
    assert plain == pruned


def test_group_sample_undershoot_raises(corpus):
    with pytest.raises(RuntimeError, match="undershot"):
        group_sample(corpus, 50, hash_fn="md5", prune_min_group=1, oversample=0.01)


def test_contamination_planted(spark):
    shared = "alpha beta gamma delta epsilon"  # one exact 5-gram
    rows = []
    # find an eval doc_id under md5 split (e:id % 20 == 0)
    eval_id = next(i for i in range(1, 1000) if _md5_32(f"e:{i}") % 20 == 0)
    train_id = next(i for i in range(1, 1000) if _md5_32(f"e:{i}") % 20 != 0)
    short_eval = next(
        i for i in range(1000, 2000) if _md5_32(f"e:{i}") % 20 == 0
    )
    rows.append((eval_id, shared + " zeta eta", "en"))  # 3 shingles, 1 shared
    rows.append((train_id, "pre " + shared + " post", "en"))
    rows.append((short_eval, "too short", "en"))  # no 5-gram
    out = {r.doc_id: r for r in contamination(_docs(spark, rows), hash_fn="md5").collect()}
    assert set(out) == {eval_id, short_eval}
    r = out[eval_id]
    assert (r.n_shingles, r.n_contaminated) == (3, 1)
    assert r.contamination == round(1 / 3, 6)
    assert (out[short_eval].n_shingles, out[short_eval].contamination) == (0, 0.0)


def test_write_packed_roundtrip(spark, corpus, tmp_path):
    from cadastre_pg_spark.operators.corpus import write_packed

    out = str(tmp_path / "shards")
    write_packed(corpus, out, capacity=128, n_writers=4, hash_fn="md5")
    back = spark.read.parquet(out)
    # every doc present once with its text intact
    assert back.count() == corpus.count()
    orig = {r.doc_id: r.text for r in corpus.collect()}
    assert {r.doc_id: r.text for r in back.collect()} == orig
    # directory partitioning == the computed assignment
    assign = {
        r.doc_id: (r.writer, r.shard)
        for r in pack_tokens(corpus, capacity=128, n_writers=4, hash_fn="md5").collect()
    }
    got = {r.doc_id: (r.writer, r.shard) for r in back.collect()}
    assert got == assign
    # one file per (writer, shard), rows ordered by doc_id inside it
    import glob

    files = glob.glob(f"{out}/writer=*/shard=*/*.parquet")
    dirs = {tuple(f.split("/")[-3:-1]) for f in files}
    assert len(files) == len(dirs) == len(set(assign.values()))
    one = sorted(files)[0]
    ids = [r.doc_id for r in spark.read.parquet(one).collect()]
    assert ids == sorted(ids) and len(ids) > 0


def test_budget_mixture_rates_and_cap(spark):
    from cadastre_pg_spark.operators.corpus import MILLION, budget_mixture

    # en: 4 docs x 4 tokens = 16 tokens; de: 2 docs x 4 = 8 tokens
    rows = [(i, "a b c d", "en") for i in range(4)] + [
        (10 + i, "w x y z", "de") for i in range(2)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    # budget 8, en weight 0.5 -> 4 tokens of 16 -> rate 0.25;
    # de weight 0.5 -> 4 of 8 -> rate 0.5
    out = budget_mixture(docs, {"en": 0.5, "de": 0.5}, 8)
    for r in out.collect():
        exp = 250_000 if r["stratum"] == "en" else 500_000
        assert r["u"] < exp
    # the threshold rule is exact: recompute survivors independently
    from cadastre_pg_spark.operators.corpus import _hash32

    us = {
        r["doc_id"]: r["u"]
        for r in docs.select(
            "doc_id", F.pmod(_hash32(F.col("doc_id"), "m:", "xxhash64"), F.lit(MILLION)).alias("u")
        ).collect()
    }
    want = {
        d
        for d, u in us.items()
        if u < (250_000 if d < 10 else 500_000)
    }
    assert {r["doc_id"] for r in out.collect()} == want

    # a group whose target exceeds its tokens keeps EVERYTHING
    out2 = budget_mixture(docs, {"de": 1.0}, 1000)
    assert sorted(r["doc_id"] for r in out2.collect()) == [10, 11]
    # zero-weight groups are dropped entirely
    assert out2.filter(F.col("stratum") == "en").count() == 0


def test_budget_mixture_is_broadcast_no_collect(spark):
    """Stats derivation must stay in-plan: the group census joins back
    via broadcast; corpus rows shuffle only for the tiny stats agg."""
    from cadastre_pg_spark.operators.corpus import budget_mixture
    from cadastre_pg_spark.plans.audit import explain_string

    docs = spark.createDataFrame(
        [(0, "a b", "en"), (1, "c d", "de")], "doc_id long, text string, lang string"
    )
    plan = explain_string(budget_mixture(docs, {"en": 1.0}, 10), mode="simple")
    assert "BroadcastHashJoin" in plan


def test_corpus_prep_gates_dedups_and_packs(spark):
    from cadastre_pg_spark.operators.corpus import corpus_prep

    good = "the cat and the dog sat of the mat " * 8  # en, long, clean
    rows = [
        (1, good, "en"),
        (2, good, "en"),                   # exact dup of 1 -> dropped
        (3, good, "fr"),                   # label mismatch -> dropped
        (4, "x!!!!" * 40, "en"),           # punct-heavy -> low quality
        (5, good + "tail", "en"),          # distinct survivor
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = corpus_prep(df, min_quality=0.5, capacity=64, n_writers=2)
    got = {r.doc_id: r for r in out.collect()}
    assert set(got) == {1, 5}
    assert all(r.n_tokens > 0 for r in got.values())


def test_dsir_logratio_separates_target_like_docs(spark):
    import math

    from cadastre_pg_spark.operators.corpus import dsir_logratio

    # target (lang=en) docs use the aa/bb vocabulary, source-only docs
    # use xx/yy; a doc made of target-side tokens must score HIGHER
    # than one made of source-only tokens
    rows = [
        (1, "aa bb aa bb aa", "en"),
        (2, "aa aa bb bb bb", "en"),
        (3, "xx yy xx yy xx", "fr"),
        (4, "aa bb aa bb", "fr"),   # target-vocab doc outside the target
        (5, "xx yy", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r.doc_id: r
        for r in dsir_logratio(df, F.col("lang") == "en").collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1].n_tokens == 5
    assert out[1].logratio > 0 > out[3].logratio
    assert out[4].logratio > 0  # looks like the target even if not in it
    # numpy replay of doc 5: per-bucket u = ln(n_t+1)-ln(n_s+1) in
    # micro-nats, shift = ln(N_t+V)-ln(N_s+V); xx,yy have n_t=0
    n_s = {"aa": 7, "bb": 7, "xx": 4, "yy": 3}
    n_t = {"aa": 5, "bb": 5, "xx": 0, "yy": 0}
    V, Ns, Nt = 4, sum(n_s.values()), sum(n_t.values())
    u = {
        k: round(math.log(n_t[k] + 1) * 1e6) - round(math.log(n_s[k] + 1) * 1e6)
        for k in n_s
    }
    shift = round(math.log(Nt + V) * 1e6) - round(math.log(Ns + V) * 1e6)
    want = round((u["xx"] * 1 + u["yy"] * 1 - 2 * shift) / 1e6, 6)
    assert abs(out[5].logratio - want) < 1e-9


def test_dsir_logratio_empty_target_is_all_nonpositive(spark):
    from cadastre_pg_spark.operators.corpus import dsir_logratio

    rows = [(1, "aa bb cc", "fr"), (2, "dd ee", "fr")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = dsir_logratio(df, F.col("lang") == "en").collect()
    # with no target docs every bucket has n_t=0: u=-ln(n_s+1)<=0 and
    # the shift is ln(V)-ln(N_s+V)<0, so ratios need not be negative —
    # but they must be FINITE and the op must not divide by zero
    assert len(out) == 2 and all(r.logratio is not None for r in out)


def test_dsir_select_gumbel_topk_matches_hand_computation(spark):
    import hashlib
    import math

    from cadastre_pg_spark.operators.corpus import dsir_logratio, dsir_select

    rows = [
        (i, ("aa bb " * 5) if i % 2 == 0 else ("xx yy " * 5),
         "en" if i % 4 == 0 else "fr")
        for i in range(1, 21)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    tgt = F.col("lang") == "en"
    lr = {r.doc_id: r.logratio
          for r in dsir_logratio(df, tgt, hash_fn="md5").collect()}

    def gumbel_key(doc_id):
        h = int(hashlib.md5(f"g:{doc_id}".encode()).hexdigest()[:8], 16)
        u = (h + 1) / 4294967296.0
        return round(lr[doc_id] * 1e6) + round(-math.log(-math.log(u)) * 1e6)

    want = sorted(lr, key=lambda d: (-gumbel_key(d), d))[:5]
    got = dsir_select(df, tgt, k=5, hash_fn="md5").collect()
    assert [r.doc_id for r in sorted(got, key=lambda r: r.rank)] == want
    for r in got:
        assert abs(r.key - gumbel_key(r.doc_id) / 1e6) < 1e-9


def test_hash_split_group_atomic_and_exact_replay(spark):
    from cadastre_pg_spark.operators.corpus import hash_split

    rows = [(i, "t", f"host{i % 7}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = hash_split(df, group_col="source", hash_fn="md5").collect()
    # group-atomic: every doc of a host lands in ONE split
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, set()).add(r.split)
    assert all(len(s) == 1 for s in by_grp.values())
    # exact replay of u and the interval rule
    for r in out:
        u = _md5_32(f"sp:{r.grp}") % MILLION
        assert r.u == u
        want = "train" if u < 900_000 else ("val" if u < 950_000 else "test")
        assert r.split == want


def test_hash_split_per_doc_proportions_and_validation(spark):
    import pytest as _pytest

    from cadastre_pg_spark.operators.corpus import hash_split

    rows = [(i, "t", "s") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = hash_split(df).groupBy("split").count().collect()
    got = {r.split: r["count"] for r in out}
    assert abs(got["train"] / 4000 - 0.9) < 0.03
    assert abs(got.get("val", 0) / 4000 - 0.05) < 0.02
    assert abs(got.get("test", 0) / 4000 - 0.05) < 0.02
    with _pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, splits=[("a", 0.5), ("b", 0.4)])
    with _pytest.raises(ValueError, match="duplicate"):
        hash_split(df, splits=[("a", 0.5), ("a", 0.5)])


def test_corpus_report_counts_dups_and_entropy(spark):
    import math

    from cadastre_pg_spark.operators.corpus import corpus_report

    text = "the cat and the dog sat on the mat today"
    rows = [
        (1, text, "en"), (2, text, "en"),       # one exact dup pair
        (3, text + " x", "en"), (4, "le chat noir dort ici bien", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    r = corpus_report(df).collect()[0]
    assert (r.n_docs, r.n_unique) == (4, 3)
    assert r.dup_rate == 0.25
    assert r.total_tokens == 10 + 10 + 11 + 6
    # entropy of {en: 3, fr: 1} with micro-nat quantization
    u = lambda n: round(math.log(n) * 1e6)
    want = round((3 * (u(4) - u(3)) + 1 * (u(4) - u(1))) / 4 / 1e6, 6)
    assert abs(r.lang_entropy - want) < 1e-9
    assert 0.0 <= r.mean_quality <= 1.0
