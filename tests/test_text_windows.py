"""redact_pii, sliding_user_stats, host_stats unit tests."""

from datetime import datetime

from pyspark.sql import functions as F

from cadastre_pg_spark.operators.corpus import host_stats
from cadastre_pg_spark.operators.textanalysis import redact_pii
from cadastre_pg_spark.operators.windows import sliding_user_stats


def test_redact_pii_counts_and_masks(spark):
    docs = spark.createDataFrame(
        [
            (1, "write to alice.b@corp.example.org or bob@ex.io today"),
            (2, "call +33612345678 about x@y.fr"),
            (3, "no pii here"),
            (4, "bad pattern a@b and +123 stay"),  # too-short tld / phone
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert (rows[1].n_emails, rows[1].n_phones) == (2, 0)
    assert rows[1].redacted == "write to <EMAIL> or <EMAIL> today"
    assert (rows[2].n_emails, rows[2].n_phones) == (1, 1)
    assert rows[2].redacted == "call <PHONE> about <EMAIL>"
    assert (rows[3].n_emails, rows[3].n_phones) == (0, 0)
    assert rows[3].redacted == "no pii here"
    # 'a@b' has no dot-tld; '+123' is under 7 digits — both untouched
    assert (rows[4].n_emails, rows[4].n_phones) == (0, 0)
    assert rows[4].redacted == "bad pattern a@b and +123 stay"


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, value double"
    )


def test_sliding_window_inclusive_hour_boundary(spark):
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 7, datetime(2024, 1, 1, 11, 0, 0), 1.0),   # exactly 1h before t2
        (2, 7, datetime(2024, 1, 1, 11, 0, 0, 1), 2.0),
        (3, 7, t0, 4.0),
    ]
    out = {r.event_id: r for r in sliding_user_stats(_ev(spark, rows)).collect()}
    # RANGE frame is inclusive at -1h: event 1 is IN event 3's window
    assert out[3].n_win == 3 and out[3].sum_win == 7.0
    assert out[1].n_win == 1 and out[1].sum_win == 1.0
    assert out[2].n_win == 2 and out[2].sum_win == 3.0
    assert out[3].avg_win == 7.0 / 3


def test_sliding_window_excludes_beyond_hour_and_other_users(spark):
    rows = [
        (1, 7, datetime(2024, 1, 1, 10, 59, 59, 999999), 1.0),
        (2, 8, datetime(2024, 1, 1, 11, 30, 0), 100.0),  # other user
        (3, 7, datetime(2024, 1, 1, 12, 0, 0), 4.0),
    ]
    out = {r.event_id: r for r in sliding_user_stats(_ev(spark, rows)).collect()}
    assert out[3].n_win == 1 and out[3].sum_win == 4.0


def test_sliding_window_simultaneous_events_are_peers(spark):
    t = datetime(2024, 1, 1, 12, 0, 0, 500000)
    rows = [(1, 7, t, 1.0), (2, 7, t, 2.0)]
    out = {r.event_id: r for r in sliding_user_stats(_ev(spark, rows)).collect()}
    # same RANGE anchor -> both frames hold both events
    assert out[1].n_win == 2 and out[2].n_win == 2
    assert out[1].sum_win == 3.0


def test_host_stats_rollup(spark):
    pages = spark.createDataFrame(
        [
            ("https://a.example.fr/p/1", "fr", "abcd"),
            ("https://a.example.fr/p/2", "en", "ab"),
            ("http://b.example.fr/p/3", "fr", "abc"),
        ],
        "url string, lang string, text string",
    )
    rows = {r.host: r for r in host_stats(pages).collect()}
    a = rows["a.example.fr"]
    assert (a.n_pages, a.n_langs, a.n_fr, a.sum_chars) == (2, 2, 1, 6)
    b = rows["b.example.fr"]  # http scheme also parsed
    assert (b.n_pages, b.n_langs, b.n_fr, b.sum_chars) == (1, 1, 1, 3)


def test_user_path_length_golden(spark):
    from cadastre_pg_spark.operators.windows import user_path_length

    rows = [
        # user 7: right triangle walk 3-4-5
        (1, 7, datetime(2024, 1, 1, 10, 0), 0.0, 0.0),
        (2, 7, datetime(2024, 1, 1, 11, 0), 3.0, 0.0),
        (3, 7, datetime(2024, 1, 1, 12, 0), 3.0, 4.0),
        # user 8: single point -> no steps
        (4, 8, datetime(2024, 1, 1, 10, 0), 1.0, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, lon double, lat double"
    )
    out = {r.user_id: r for r in user_path_length(df).collect()}
    assert out[7].n_steps == 2
    assert out[7].path_len == 7.0  # 3 + 4, exact in units
    assert out[7].max_step == 4.0
    assert out[8].n_steps == 0 and out[8].path_len == 0.0
    assert out[8].max_step is None


def test_user_path_orders_by_ts_then_id(spark):
    from cadastre_pg_spark.operators.windows import user_path_length

    t = datetime(2024, 1, 1, 10, 0)
    rows = [  # same ts: event_id breaks the tie -> path 1+1, not 2+0
        (2, 7, t, 1.0, 0.0),
        (1, 7, t, 0.0, 0.0),
        (3, 7, t, 2.0, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, lon double, lat double"
    )
    row = user_path_length(df).collect()[0]
    assert (row.n_steps, row.path_len) == (2, 2.0)


def test_bpe_token_count_goldens(spark):
    from cadastre_pg_spark.operators.textanalysis import bpe_token_count

    rows = [
        (1, "Hello world"),      # [Hello][ world]
        (2, "don't stop!"),      # [don]['t][ stop][!]
        (3, "abc123!! x"),       # [abc][123][!!][ x]
        (4, ""),                 # no tokens (whitespace split says 1)
        (5, "café über"),  # unicode letters covered by \p{L}
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.n_tokens for r in bpe_token_count(df).collect()}
    assert out == {1: 2, 2: 4, 3: 4, 4: 0, 5: 2}


# ------------------------------------------------------------ hausdorff


def _hd(spark, sets, pair_list):
    from cadastre_pg_spark.operators.windows import hausdorff_pairs

    rows = [
        (uid, i, float(x), float(y))
        for uid, pts in sets.items()
        for i, (x, y) in enumerate(pts)
    ]
    points = spark.createDataFrame(
        rows, "user_id long, event_id long, x double, y double"
    )
    pairs = spark.createDataFrame(pair_list, "a long, b long")
    return {(r.a, r.b): r for r in hausdorff_pairs(points, pairs).collect()}


def _brute_hd2(A, B):
    def directed(P, Q):
        return max(min((px - qx) ** 2 + (py - qy) ** 2 for qx, qy in Q) for px, py in P)

    return max(directed(A, B), directed(B, A))


def test_hausdorff_known_segments(spark):
    # unit-offset parallel segments: hd = 1
    A = [(0.0, 0.0), (1.0, 0.0), (2.0, 0.0)]
    B = [(0.0, 1.0), (1.0, 1.0), (2.0, 1.0)]
    got = _hd(spark, {1: A, 2: B}, [(1, 2)])[(1, 2)]
    assert got.hd2 == 1.0 and got.hd == 1.0
    assert got.n_a == 3 and got.n_b == 3


def test_hausdorff_asymmetric_outlier(spark):
    # B has a far outlier: the symmetric distance is dominated by it
    A = [(0.0, 0.0), (1.0, 0.0)]
    B = [(0.0, 0.0), (10.0, 0.0)]
    got = _hd(spark, {1: A, 2: B}, [(1, 2)])[(1, 2)]
    assert got.hd2 == 81.0  # (10-1)^2


def test_hausdorff_matches_brute_force(spark):
    import math

    sets = {
        u: [(((u * 7 + i * 13) % 29) / 3.0, ((u * 11 + i * 5) % 31) / 4.0)
            for i in range(6 + u)]
        for u in range(1, 5)
    }
    pair_list = [(1, 2), (2, 3), (1, 4), (3, 4)]
    got = _hd(spark, sets, pair_list)
    for a, b in pair_list:
        want = _brute_hd2(sets[a], sets[b])
        assert got[(a, b)].hd2 == want, (a, b)
        assert got[(a, b)].hd == math.sqrt(want)


def test_hausdorff_identical_sets_zero(spark):
    A = [(1.5, 2.5), (3.5, 4.5)]
    got = _hd(spark, {1: A, 2: list(A)}, [(1, 2)])[(1, 2)]
    assert got.hd2 == 0.0 and got.hd == 0.0


# ------------------------------------------------ gaps / rolling_ols


def test_gap_report_finds_only_long_gaps(spark):
    from datetime import datetime, timedelta
    from cadastre_pg_spark.operators.windows import gap_report

    t0 = datetime(2024, 3, 1)
    rows = [
        (1, t0), (1, t0 + timedelta(hours=1)),          # 1h: no
        (1, t0 + timedelta(hours=7)),                    # 6h: yes
        (1, t0 + timedelta(hours=7, minutes=30)),        # 30m: no
        (2, t0), (2, t0 + timedelta(hours=5)),           # 5h: yes
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = gap_report(df, gap_us=4 * 3_600_000_000).collect()
    by = {(r.grp): r for r in got}
    assert len(got) == 2
    assert by[1].gap_us == 6 * 3_600_000_000
    assert by[2].gap_us == 5 * 3_600_000_000


def test_rolling_ols_window_matches_full_fit_on_short_series(spark):
    from datetime import datetime, timedelta
    import numpy as np
    from cadastre_pg_spark.operators.windows import rolling_ols

    t0 = datetime(2024, 1, 1)
    vs = [1.0, 2.0, 4.0, 8.0, 16.0]
    rows = [(1, t0 + timedelta(minutes=i), v) for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sorted(rolling_ols(df, k=3).collect(), key=lambda r: r.ts)
    # first row: window of 1 -> NULL slope; second: 2 points
    assert out[0].n_win == 1 and out[0].slope is None
    y = [int(np.floor(v * 100 + 0.5)) for v in vs]
    for i in range(1, 5):
        lo = max(0, i - 2)
        xs = np.arange(lo, i + 1, dtype=float)
        ys = np.array(y[lo:i + 1], dtype=float)
        want = np.polyfit(xs, ys, 1)[0]
        assert abs(out[i].slope - want) < 1e-9, i


def test_cell_entropy_pure_and_even_mix(spark):
    import math
    from cadastre_pg_spark.operators.density import cell_entropy

    rows = [(1, "a")] * 8 + [(2, "a")] * 4 + [(2, "b")] * 4
    df = spark.createDataFrame(rows, "cell long, event_type string")
    got = {r.cell: r for r in cell_entropy(df).collect()}
    assert got[1].ent_u == 0 and got[1].n_cats == 1          # pure: H = 0
    # even 2-way mix: H = ln 2 nats -> ent_u / (n * 1e6) ~ ln 2
    h = got[2].ent_u / (got[2].n * 1e6)
    assert abs(h - math.log(2)) < 1e-5
