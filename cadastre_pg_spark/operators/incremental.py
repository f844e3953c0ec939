"""Mergeable aggregation states — the algebraic-aggregate contract
that makes 100 TB pipelines INCREMENTAL: aggregate each new partition
of data once into a compact per-group state, then MERGE states instead
of rescanning history (the same lattice HLL/count-min sketches live
on, here for the exact plain aggregates: count / sum / min / max).

merge(agg_state(A), agg_state(B)) == agg_state(A union B) for any
split of the rows — count and DECIMAL sum are associative-commutative
(the house order-independence rule: sums go through DECIMAL casts of
short-decimal inputs, so no float reassociation), min/max are lattice
joins. The driver query proves the contract against a recompute-from-
scratch SQL oracle.

Scale shape: each agg_state is one hash aggregate with map-side
partials; merge is a unionByName + one re-aggregate over states whose
cardinality is the GROUP count, not the row count — the incremental
path never touches historical rows.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(28,6)"


def agg_state(
    df: DataFrame,
    group_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Compact exact state per group: (grp, n, s, vmin, vmax)."""
    v = F.col(value_col)
    return df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v.cast(DEC)).alias("s"),
        F.min(v.cast("double")).alias("vmin"),
        F.max(v.cast("double")).alias("vmax"),
    )


def merge_agg_states(*states: DataFrame) -> DataFrame:
    """Combine any number of agg_state frames into one equivalent
    state — n adds, s adds (DECIMAL, order-independent), min/max
    lattice-join. Input order cannot change the result."""
    it = iter(states)
    u = next(it)
    for s in it:
        u = u.unionByName(s)
    return u.groupBy("grp").agg(
        F.sum("n").alias("n"),
        F.sum("s").cast(DEC).alias("s"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )


def state_stats(state: DataFrame) -> DataFrame:
    """Close a state into consumer stats: mean = s / n (one double
    division of the exact DECIMAL sum), plus the state fields."""
    return state.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        "s",
        "vmin",
        "vmax",
        (F.col("s").cast("double") / F.col("n").cast("double")).alias("mean"),
    )
