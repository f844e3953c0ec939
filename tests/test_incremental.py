"""Mergeable aggregation states: merge(state(A), state(B)) ==
state(A u B) for arbitrary splits — the incremental-pipeline
contract."""

from decimal import Decimal

from cadastre_pg_spark.operators.incremental import (
    agg_state,
    merge_agg_states,
    state_stats,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "user_id long, value double")


def _collect(state):
    return {
        r.grp: (r.n, r.s, r.vmin, r.vmax) for r in state.collect()
    }


def test_merge_equals_recompute_any_split(spark):
    rows = [(i % 5, float(i) * 0.25 + 0.01) for i in range(60)]
    full = _collect(agg_state(_df(spark, rows)))
    for k in (2, 3):
        parts = [
            _df(spark, [r for i, r in enumerate(rows) if i % k == j])
            for j in range(k)
        ]
        merged = _collect(merge_agg_states(*[agg_state(p) for p in parts]))
        assert merged == full, k


def test_merge_is_order_insensitive(spark):
    a = agg_state(_df(spark, [(1, 2.5), (2, -1.0)]))
    b = agg_state(_df(spark, [(1, 7.25), (3, 0.0)]))
    ab = _collect(merge_agg_states(a, b))
    ba = _collect(merge_agg_states(b, a))
    assert ab == ba
    assert ab[1] == (2, Decimal("9.750000"), 2.5, 7.25)


def test_state_stats_mean_from_exact_sum(spark):
    s = agg_state(_df(spark, [(9, 1.1), (9, 2.2), (9, 3.3)]))
    out = state_stats(s).collect()[0]
    assert out.n == 3
    assert abs(out.mean - 2.2) < 1e-12


def test_merge_disjoint_groups_passthrough(spark):
    a = agg_state(_df(spark, [(1, 5.0)]))
    b = agg_state(_df(spark, [(2, 6.0)]))
    m = _collect(merge_agg_states(a, b))
    assert m[1][0] == 1 and m[2][0] == 1
