"""Group statistics — z-score outlier detection and per-group Pearson
correlation, built on the house exactness pattern: every SUM runs
through DECIMAL casts of inputs whose decimal expansion is short
(event values carry 2 decimals; products stay exact in DECIMAL), so
the aggregates are order-independent and bit-identical across engines;
the final variance/correlation combination is fixed-shape IEEE double
arithmetic (multiply/subtract/divide/sqrt — sqrt is correctly rounded
everywhere), rounded to 6 decimals at the output boundary per house
policy for derived floats.

Scale shape: single hash aggregates with map-side partials (the
z-score pass re-joins the per-group moments back onto the scan as a
broadcast — groups are low-cardinality dimensions). No window, no
self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(28,6)"


def _moments(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    v = F.col(value_col).cast(DEC)
    return df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("sx"),
        F.sum(v * v).alias("sxx"),
    )


def zscore_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    threshold: float = 3.0,
) -> DataFrame:
    """Rows whose value deviates more than `threshold` population
    standard deviations from their group mean -> (id, group, value,
    z) with z rounded to 6 decimals. Groups with zero variance emit
    nothing (z undefined)."""
    mom = _moments(df, group_col, value_col)
    # fixed-shape double math from the exact decimal moments
    mean = F.col("sx").cast("double") / F.col("n")
    var = (
        F.col("sxx").cast("double") / F.col("n") - mean * mean
    )
    stats = mom.select(
        "grp", mean.alias("mean"), F.sqrt(var).alias("sd")
    )
    j = df.join(stats, df[group_col] == stats.grp)
    z = (F.col(value_col) - F.col("mean")) / F.col("sd")
    return (
        j.filter(F.col("sd") > F.lit(0.0))
        .filter((z > F.lit(threshold)) | (z < -F.lit(threshold)))
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col(value_col),
            F.round(z, 6).alias("z"),
        )
    )


def group_corr(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Pearson correlation of two columns -> (group, n,
    corr) with corr rounded to 6 decimals; groups where either side
    is constant emit corr = NULL."""
    x = F.col(x_col).cast(DEC)
    y = F.col(y_col).cast(DEC)
    agg = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    dx = n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    dy = n * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double")
    corr = F.when(
        (dx > F.lit(0.0)) & (dy > F.lit(0.0)),
        F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6),
    )
    return agg.select(F.col("grp").alias(group_col), "n", corr.alias("corr"))


def profile_table(
    df: DataFrame,
    numeric_cols: tuple = (),
    other_cols: tuple = (),
) -> DataFrame:
    """ANALYZE-style column profile in ONE scan: per column the row
    count, null count, exact distinct count, and (numeric columns)
    min/max as doubles. -> (col_name, n, n_null, n_distinct, min_num,
    max_num).

    Scale note: multiple COUNT(DISTINCT) make Catalyst plan an Expand
    (one duplicated stream per distinct aggregate) — exact and fine at
    dimension-table scale; for 100 TB fact columns swap the distinct
    counts for sketches.hll_distinct (documented trade, same output
    shape modulo estimate)."""
    cols = list(numeric_cols) + list(other_cols)
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    for c in numeric_cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"mn_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"mx_{c}"))
    a = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n").alias("n"),
                (F.col("n") - F.col(f"nn_{c}")).alias("n_null"),
                F.col(f"nd_{c}").alias("n_distinct"),
                (
                    F.col(f"mn_{c}")
                    if c in numeric_cols
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"mx_{c}")
                    if c in numeric_cols
                    else F.lit(None).cast("double")
                ).alias("max_num"),
            )
            for c in cols
        ]
    )
    return a.select(F.explode(rows).alias("p")).select("p.*")


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust (median/MAD) outlier census per group — the
    heavy-tail-safe sibling of zscore_outliers (a single wild value
    shifts a mean but not a median): med = median(x), mad =
    median(|x - med|), outlier iff |x - med| > k * mad. Output
    (group, med, mad, n, n_outliers).

    Exactness: Spark's `percentile(0.5)` and DuckDB's quantile_cont
    interpolate identically on sorted doubles (bitwise, repo-probed),
    |x - med| and the k*mad threshold are fixed-order double ops, so
    the twin replays the census exactly — no rounding grid.

    Scale contract: exact medians buffer each group's values (two
    grouped percentile passes + one broadcast join back); at 100 TB
    swap approx_percentile (t-digest) into the same shape — this form
    is the oracle-able sibling.
    """
    med = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("med")
    )
    j = df.join(med, group_col)
    dev = F.abs(F.col(value_col) - F.col("med"))
    madf = j.groupBy(group_col, "med").agg(
        F.percentile(dev, F.lit(0.5)).alias("mad"),
        F.count(F.lit(1)).alias("n"),
    )
    j2 = df.join(madf, group_col)
    return (
        j2.groupBy(group_col, "med", "mad", "n")
        .agg(
            F.count(
                F.when(
                    F.abs(F.col(value_col) - F.col("med"))
                    > F.lit(k) * F.col("mad"),
                    1,
                )
            ).alias("n_outliers")
        )
        .select(group_col, "med", "mad", "n", "n_outliers")
    )
