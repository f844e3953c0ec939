"""Sliding-window event analytics — time-RANGE window frames over the
user timeline (the batch twin of the streaming windowed aggregations in
streaming/events.py; reference analog: the A-family per-entity stats).

Scale shape: the canonical window plan — ONE exchange on user_id, one
per-partition sort on the event time, then a running frame scan; no
self-join, no explode. Sums go through DECIMAL(18,2) casts so the
frame aggregation is order-independent and exactly replayable by the
DuckDB oracle (repo invariant). The frame is anchored on
microsecond epochs (unix_micros == DuckDB epoch_us) because the test
events carry sub-second timestamps — truncating to seconds would move
frame boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HOUR_US = 3_600_000_000


def sliding_user_stats(events: DataFrame, window_us: int = HOUR_US) -> DataFrame:
    """Per event: count / exact sum / mean of `value` over the trailing
    `window_us` microseconds of the same user's events (RANGE frame —
    simultaneous events are peers and always share a frame)."""
    w = (
        Window.partitionBy("user_id")
        # ts is TIMESTAMP_NTZ in the driver parquet; unix_micros wants
        # TIMESTAMP — the cast is value-identical under the UTC session
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-window_us, 0)
    )
    sum_dec = F.sum(F.col("value").cast("decimal(18,2)")).over(w)
    cnt = F.count(F.lit(1)).over(w)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        cnt.alias("n_win"),
        sum_dec.cast("double").alias("sum_win"),
        (sum_dec.cast("double") / cnt).alias("avg_win"),
    )


PATH_UNIT = 1e12  # 1 unit = 1e-12 deg; country-scale paths stay < 2^53


def user_path_length(points: DataFrame) -> DataFrame:
    """Per-user trajectory length — the movement analytics join of the
    event timeline with the point derivation (geospatial x events):
    order each user's points by (ts, event_id), take consecutive
    planar step distances, and sum them EXACTLY by flooring each step
    to integer 1e-12-degree units (the pagerank quantization trick:
    floor-on-double is bitwise-portable across engines where
    double->DECIMAL casts are not; BIGINT sums are order-independent).

    Input: (event_id, user_id, ts, lon, lat). Output per user:
    n_steps, path_len (units /1e12, double), max_step (exact MAX on
    doubles — no quantization needed for comparisons).

    Scale shape: one exchange on user_id + per-partition sort (the
    canonical window plan), then a hash aggregate with map-side
    partials. Nothing wider than 5 narrow columns ever shuffles.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    dx = F.col("lon") - F.lag("lon").over(w)
    dy = F.col("lat") - F.lag("lat").over(w)
    dist = F.sqrt(dx * dx + dy * dy)
    stepped = points.select(
        "user_id",
        dist.alias("dist"),
        F.floor(dist * F.lit(PATH_UNIT)).alias("du"),
    )
    return stepped.groupBy("user_id").agg(
        F.count("du").alias("n_steps"),  # count skips the lag-null first row
        (F.coalesce(F.sum("du"), F.lit(0)).cast("double") / F.lit(PATH_UNIT)).alias(
            "path_len"
        ),
        F.max("dist").alias("max_step"),
    )


def resample_interpolate(
    events: DataFrame, step_us: int = 6 * HOUR_US
) -> DataFrame:
    """Per-user time-grid resampling with linear interpolation — the
    timeseries regularization op (hypertable-rollup cousin of the
    as-of join): for every user and every absolute grid instant
    t = k * step_us inside the user's [first, last] event range,
    v(t) = v0 + (v1 - v0) * (t - t0)/(t1 - t0) between the bracketing
    events (exact hit short-circuits to the event's value). Events
    tied on one timestamp collapse first to the min-event_id value
    (deterministic). Output (user_id, grid_ts, value).

    Numeric rule: the bracket endpoints are exact integer micros and
    the interpolation is three fixed-order double ops — replayed by a
    structurally different oracle (DuckDB's native ASOF JOIN both
    directions), so parity is semantic, not plan-copied.

    Scale shape (100 TB): NO join anywhere — grid rows (from a
    per-user min/max aggregate) union with event rows, then ONE
    exchange + sort on (user, t) carries both backward and forward
    IGNORE-NULLS frame fills; events sort before grid points on ties
    so an exact-hit grid instant sees its event in the backward frame.
    """
    ev = (
        events.select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
            "value",
            "event_id",
        )
        .groupBy("user_id", "t")
        .agg(F.min_by("value", "event_id").alias("v"))
        .select("user_id", "t", "v", F.lit(1).alias("is_ev"))
    )
    grid = (
        ev.groupBy("user_id")
        .agg(F.min("t").alias("mn"), F.max("t").alias("mx"))
        .select(
            "user_id",
            # ceil/floor to step multiples in pure BIGINT ops
            (
                (F.col("mn") + F.lit(step_us - 1))
                - F.pmod(F.col("mn") + F.lit(step_us - 1), F.lit(step_us))
            ).alias("gs"),
            (F.col("mx") - F.pmod(F.col("mx"), F.lit(step_us))).alias("ge"),
        )
        .filter(F.col("gs") <= F.col("ge"))  # span may hold no multiple
        .select(
            "user_id",
            F.explode(F.sequence("gs", "ge", F.lit(step_us))).alias("t"),
            F.lit(None).cast("double").alias("v"),
            F.lit(0).alias("is_ev"),
        )
    )
    u = ev.unionByName(grid)
    w = Window.partitionBy("user_id").orderBy(
        F.col("t").asc(), F.col("is_ev").desc()
    )
    evv = F.when(F.col("is_ev") == 1, F.col("v"))
    evt = F.when(F.col("is_ev") == 1, F.col("t"))
    filled = u.select(
        "user_id",
        "t",
        "is_ev",
        F.last(evv, ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("v0"),
        F.last(evt, ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("t0"),
        F.first(evv, ignorenulls=True)
        .over(w.rowsBetween(0, Window.unboundedFollowing))
        .alias("v1"),
        F.first(evt, ignorenulls=True)
        .over(w.rowsBetween(0, Window.unboundedFollowing))
        .alias("t1"),
    )
    interp = F.col("v0") + (F.col("v1") - F.col("v0")) * (
        (F.col("t") - F.col("t0")).cast("double")
        / (F.col("t1") - F.col("t0")).cast("double")
    )
    return filled.filter(F.col("is_ev") == 0).select(
        "user_id",
        F.timestamp_micros(F.col("t")).alias("grid_ts"),
        F.round(
            F.when(F.col("t0") == F.col("t"), F.col("v0")).otherwise(interp), 6
        ).alias("value"),
    )


def stay_points(
    points: DataFrame,
    min_pts: int = 2,
    min_us: int = 0,
) -> DataFrame:
    """Trajectory dwell detection (stay points): maximal runs of
    CONSECUTIVE same-cell observations per user, kept when the run has
    >= min_pts points and lasts >= min_us. Input needs (user_id, ts,
    event_id, cell) — the cell is assigned by the caller at whatever
    level defines "the same place" (coarse grid = city-block dwell).
    Output (user_id, cell, enter_ts, exit_ts, n_points).

    Ordering is the house (ts, event_id) tie rule; everything is
    integer/timestamp arithmetic, so the SQL twin replays it exactly.

    Scale shape (100 TB): the sessionize plan — ONE exchange + sort on
    user_id for the lag + run-id cumsum, then a (user, run) hash
    aggregate; no join, no explode.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    new_seg = F.when(
        F.lag("cell").over(w).isNull()
        | (F.lag("cell").over(w) != F.col("cell")),
        F.lit(1),
    ).otherwise(F.lit(0))
    seg = F.sum(new_seg).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = points.select(
        "user_id", "ts", "cell", seg.alias("seg")
    ).groupBy("user_id", "seg", "cell").agg(
        F.min("ts").alias("enter_ts"),
        F.max("ts").alias("exit_ts"),
        F.count(F.lit(1)).alias("n_points"),
    )
    return runs.filter(
        (F.col("n_points") >= F.lit(min_pts))
        & (
            F.unix_micros(F.col("exit_ts").cast("timestamp"))
            - F.unix_micros(F.col("enter_ts").cast("timestamp"))
            >= F.lit(min_us)
        )
    ).select("user_id", "cell", "enter_ts", "exit_ts", "n_points")


def ewma(events: DataFrame, alpha: float = 0.25) -> DataFrame:
    """Per-user exponentially weighted moving average of `value` over
    the (ts, event_id)-ordered event stream: s_1 = x_1, s_i =
    s_{i-1} * (1-alpha) + x_i * alpha; output (user_id, n, ewma) with
    the FINAL smoothed level — the online-signal summary (anomaly
    baselines, engagement decay).

    Exactness: an inherently SEQUENTIAL recurrence — no order-free
    rewrite exists — so parity uses the repo's sequential-fold rule:
    Spark's Catalyst aggregate() seeded with the first element folds
    left-to-right exactly like DuckDB's list_reduce, and the fold body
    is the identical two-multiply-one-add expression, so the raw
    doubles match BITWISE (no rounding grid; alpha ships to SQL via
    repr). Catalyst folds are interpreted, but the fold runs once per
    USER over that user's values — not per event pair.

    Scale shape: one (user) collect_list aggregate (map-side partial
    lists), array_sort, one fold — no window, no join.
    """
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
                F.col("event_id").alias("e"),
                F.col("value").alias("v"),
            )
        )
    )
    g = events.groupBy("user_id").agg(arr.alias("a"))
    vals = F.transform(F.col("a"), lambda s: s["v"])
    fold = F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(1.0 - alpha) + x * F.lit(alpha),
    )
    return g.select(
        "user_id",
        F.size("a").cast("long").alias("n"),
        fold.alias("ewma"),
    )

def cusum(
    events: DataFrame,
    drift: float,
    threshold: float,
    value_col: str = "value",
    ts_col: str = "ts",
    id_col: str = "event_id",
    key_col: str = "user_id",
) -> DataFrame:
    """Per-key one-sided CUSUM drift detector over the (ts, id)-ordered
    value stream: s_0 = 0, s_i = max(0, s_{i-1} + (x_i - drift)).
    Output (key, n, cusum_final_cents, cusum_max_cents, n_alarms) —
    the change-point / quality-drift monitor a corpus pipeline runs
    per source; n_alarms counts steps with s_i > threshold.

    The recurrence LOOKS inherently sequential (like ewma) but is not:
    the prefix identity s_i = P_i - min(0, min_{j<=i} P_j), with P the
    running sum of (x - drift), turns it into two window functions
    over one (key, time) frame — so unlike ewma there is no
    collect_list fold at all, and a key with millions of events
    streams through the window scan instead of materializing an array.

    Exactness: values are quantized to integer CENTS by the shared
    trend quantizer floor(x*100 + 0.5) (portable: floor on the same
    double), after which every running sum, running min, max and count
    is EXACT BIGINT arithmetic — order-free, no rounding grid, no
    sequential-fold parity rule needed. The final level needs no
    last-row lookup: s_n = sum(d) - min(0, min P), two plain
    aggregates.

    Scale shape: ONE exchange on the key, one per-partition sort, two
    running-frame window functions, one groupBy on the same key (no
    second exchange under AQE reuse) — the canonical window plan.
    """
    dc = int(round(drift * 100))
    hc = int(round(threshold * 100))
    cents = F.floor(
        F.col(value_col) * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    base = events.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
        F.col(id_col).alias("e"),
        (cents - F.lit(dc)).alias("d"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = F.sum("d").over(w)
    stepped = base.select(
        "k", "d", p.alias("p"), F.min(p).over(w).alias("rmin")
    ).select(
        "k",
        "d",
        "p",
        (F.col("p") - F.least(F.lit(0), F.col("rmin"))).alias("s"),
    )
    return stepped.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("d") - F.least(F.lit(0), F.min("p")))
        .cast("long")
        .alias("cusum_final_cents"),
        F.max("s").cast("long").alias("cusum_max_cents"),
        F.sum((F.col("s") > hc).cast("long")).cast("long").alias("n_alarms"),
    ).withColumnRenamed("k", key_col).select(
        key_col, "n", "cusum_final_cents", "cusum_max_cents", "n_alarms"
    )


def hausdorff_pairs(
    points: DataFrame,
    pairs: DataFrame,
    id_col: str = "user_id",
    pt_col: str = "event_id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Symmetric Hausdorff distance between trajectory (point-set)
    pairs — the similarity measure for whole paths (map-matching QA,
    duplicate-route detection, cross-vintage parcel drift). `points`
    is (id, pt, x, y); `pairs` is (a, b) with the candidate pairs to
    score (candidate generation — bbox overlap via rect_overlap_join,
    shared-cell blocking, or consecutive ids — is the caller's
    contract, exactly like the fuzzy-join blocking split). Output
    (a, b, n_a, n_b, hd2, hd): hd2 = max over both directions of
    min-over-other-set squared euclidean distance, hd = sqrt(hd2).

    Exactness contract: d2 = (ax-bx)*(ax-bx) + (ay-by)*(ay-by) is
    fixed-order IEEE; min/max are order-independent on doubles; sqrt
    is correctly rounded everywhere — the SQL twin replays bitwise.

    Scale shape: one equi-join per side on the pair's id (narrow
    keys), the cross product is CONFINED to each pair (|A|x|B| rows
    per pair, never global), the directed min is a map-side-combinable
    hash aggregate on (a, b, pt), and the closing max is a second
    narrow agg. Per-pair cost is the exact-Hausdorff lower bound;
    at scale the caller bounds it by simplifying trajectories first
    (operators/simplify) or capping candidate pairs. A padded-matrix
    einsum (mapInArrow) is the constant-factor fast path if the join
    shape ever dominates; the join form keeps the whole plan in
    whole-stage codegen.
    """
    p = points.select(
        F.col(id_col).alias("_id"),
        F.col(pt_col).alias("_pt"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    )
    # both directions share one plan: (lo, hi, dir) with dir 0 = a->b
    both = pairs.select(
        F.col("a").alias("_a"), F.col("b").alias("_b"), F.lit(0).alias("_dir")
    ).unionAll(
        pairs.select(
            F.col("b").alias("_a"), F.col("a").alias("_b"), F.lit(1).alias("_dir")
        )
    )
    left = both.join(p, F.col("_a") == F.col("_id")).select(
        "_a", "_b", "_dir",
        F.col("_pt").alias("_apt"), F.col("_x").alias("_ax"),
        F.col("_y").alias("_ay"),
    )
    q = p.select(
        F.col("_id").alias("_bid"), F.col("_x").alias("_bx"),
        F.col("_y").alias("_by"),
    )
    dx = F.col("_ax") - F.col("_bx")
    dy = F.col("_ay") - F.col("_by")
    d2 = dx * dx + dy * dy
    inner = (
        left.join(q, F.col("_b") == F.col("_bid"))
        .groupBy("_a", "_b", "_dir", "_apt")
        .agg(F.min(d2).alias("_mind2"))
    )
    directed = inner.groupBy("_a", "_b", "_dir").agg(
        F.max("_mind2").alias("_h"), F.count(F.lit(1)).alias("_n")
    )
    fwd = directed.filter(F.col("_dir") == 0).select(
        F.col("_a").alias("a"), F.col("_b").alias("b"),
        F.col("_n").alias("n_a"), F.col("_h").alias("_hab"),
    )
    bwd = directed.filter(F.col("_dir") == 1).select(
        F.col("_b").alias("a"), F.col("_a").alias("b"),
        F.col("_n").alias("n_b"), F.col("_h").alias("_hba"),
    )
    out = fwd.join(bwd, ["a", "b"])
    hd2 = F.greatest(F.col("_hab"), F.col("_hba"))
    return out.select(
        "a", "b", "n_a", "n_b", hd2.alias("hd2"), F.sqrt(hd2).alias("hd")
    )


def gap_report(
    events: DataFrame,
    gap_us: int = 4 * 3_600_000_000,
    group_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Downtime detection (the complement of sessionize): per group,
    every gap between CONSECUTIVE observations longer than `gap_us`
    micros — outage windows, sensor dropouts, churn-risk silences.
    Output (grp, gap_start, gap_end, gap_us) with gap_start the last
    event before the silence and gap_end the first one after.

    Exactness: all-integer epoch-micro arithmetic on a lag window;
    (group, ts) unique makes the order total. Scale shape: ONE lag
    window partitioned by the group key (single exchange), then a
    filter — no join, no second pass.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("ts_o")
    m = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.select(
        F.col(group_col).alias("grp"),
        F.col(ts_col).cast("timestamp").alias("ts_o"),
        m.alias("us"),
    ).withColumn("prev_ts", F.lag("ts_o").over(w)).withColumn(
        "prev_us", F.lag("us").over(w)
    )
    return (
        base.where(
            F.col("prev_us").isNotNull()
            & (F.col("us") - F.col("prev_us") > F.lit(gap_us))
        )
        .select(
            "grp",
            F.col("prev_ts").alias("gap_start"),
            F.col("ts_o").alias("gap_end"),
            (F.col("us") - F.col("prev_us")).alias("gap_us"),
        )
    )


def rolling_ols(
    events: DataFrame,
    k: int = 8,
    group_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    t0_us: int = None,
    t_unit_us: float = 60e6,
    v_unit: float = 100.0,
) -> DataFrame:
    """Rolling regression: per observation, the OLS slope of the last
    `k` observations of its group (trailing drift estimate — the
    windowed sibling of stats.linear_trend). Output (grp, ts, n_win,
    slope); slope NULL while the window holds < 2 distinct time
    buckets.

    Exactness: the linear_trend floor quantizers make x and y BIGINT,
    the five sufficient statistics are INTEGER WINDOW SUMS over ROWS
    BETWEEN k-1 PRECEDING AND CURRENT ROW (exact, frame-identical in
    the SQL twin because (group, ts) is unique), and the slope closes
    in the same fixed-order double expression as linear_trend.

    Scale shape: one window partitioned by the group key computes all
    five sums in a single pass (Spark evaluates same-frame window
    aggregates together) — one exchange, no join, no self-join.
    """
    from pyspark.sql import Window

    from .stats import T0_2024_US

    if t0_us is None:
        t0_us = T0_2024_US
    m = F.unix_micros(F.col(ts_col).cast("timestamp"))
    x = F.floor((m - F.lit(t0_us)).cast("double") / F.lit(float(t_unit_us)))
    y = F.floor(F.col(value_col) * F.lit(float(v_unit)) + F.lit(0.5))
    base = events.select(
        F.col(group_col).alias("grp"),
        F.col(ts_col).cast("timestamp").alias("ts_o"),
        x.alias("x"),
        y.alias("y"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("ts_o")
        .rowsBetween(-(k - 1), Window.currentRow)
    )
    g = base.select(
        "grp",
        F.col("ts_o").alias("ts"),
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    )
    nd = F.col("n_win").cast("double")
    sxd = F.col("sx").cast("double")
    den = nd * F.col("sxx").cast("double") - sxd * sxd
    slope = (nd * F.col("sxy").cast("double") - sxd * F.col("sy").cast("double")) / den
    return g.select(
        "grp",
        "ts",
        F.col("n_win").cast("long").alias("n_win"),
        F.when(den != 0, slope).alias("slope"),
    )


def path_interpolate(
    points: DataFrame, frac_num: int = 1, frac_den: int = 2
) -> DataFrame:
    """Point at the exact fraction frac_num/frac_den along each user's
    cumulative path length (the ST_LineInterpolatePoint analog over
    the event-timeline trajectory). 0 <= frac_num < frac_den.

    Portability by construction (house quantizer, see
    user_path_length): step lengths floor to BIGINT 1e-12-degree
    units, the cumulative sum and the target
    (total * frac_num) div frac_den are exact integers, so the CHOSEN
    segment — first step whose cumulative strictly exceeds the target
    — is identical in any engine; the within-segment lerp
    x1 + f * (x2 - x1) with f = (target - csum_prev)/du runs on
    integer-derived doubles in one fixed op order, bitwise equal
    across engines.

    Input: (event_id, user_id, ts, lon, lat). Output one row per user
    with a nonzero path: (user_id, seg_event_id, px, py).

    Scale shape: one exchange on user_id feeds both the ordered
    cumulative window and the per-user total (same partition key, one
    sort); the crossing filter needs no self-join and no row_number —
    strict monotonicity at the crossing makes the hit row unique.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    dx = F.col("lon") - F.lag("lon").over(w)
    dy = F.col("lat") - F.lag("lat").over(w)
    dist = F.sqrt(dx * dx + dy * dy)
    stepped = points.select(
        "user_id",
        "ts",
        "event_id",
        F.lag("lon").over(w).alias("x1"),
        F.lag("lat").over(w).alias("y1"),
        F.col("lon").alias("x2"),
        F.col("lat").alias("y2"),
        F.floor(dist * F.lit(PATH_UNIT)).alias("du"),
    )
    wc = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy("user_id")
    seg = stepped.select(
        "*",
        F.sum("du").over(wc).alias("csum"),
        F.sum("du").over(wt).alias("total"),
    ).where(F.col("du").isNotNull() & (F.col("total") > 0))
    target = F.expr(f"(total * {int(frac_num)}) div {int(frac_den)}")
    hit = seg.where(
        (F.col("csum") > target) & ((F.col("csum") - F.col("du")) <= target)
    )
    f = (target - (F.col("csum") - F.col("du"))).cast("double") / F.col(
        "du"
    ).cast("double")
    return hit.select(
        "user_id",
        F.col("event_id").alias("seg_event_id"),
        (F.col("x1") + f * (F.col("x2") - F.col("x1"))).alias("px"),
        (F.col("y1") + f * (F.col("y2") - F.col("y1"))).alias("py"),
    )
