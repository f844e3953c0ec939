"""Local replica of the driver's DuckDB-oracle compare so oracle parity
is testable in-repo before the driver runs it (SURVEY.md §5 carry-over:
'database integration becomes DuckDB-oracle comparison')."""

import math

import duckdb

from .session import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).fetch_df()


def canonicalize(pdf):
    """Sort columns by name, rows by all values — order-insensitive form."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf) > 0:
        pdf = pdf.sort_values(by=list(pdf.columns), na_position="first").reset_index(
            drop=True
        )
    return pdf


def _cell_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    # dtype-strict: the driver's hash canonicalization stringifies each
    # cell with its Python type, so 123 (int) != 123.0 (float).  The old
    # `==` compare was dtype-blind and certified session_overlap while
    # the driver failed it (VERDICT round 4, finding #1/#2).
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, float) != isinstance(b, float):
        return False
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if a != a and b != b:  # NaT/NaN
            return True
    except Exception:
        pass
    return a == b


def compare(spark_df, oracle_pdf, float_exact: bool = True):
    """Returns (ok, detail). Emulates the driver: row count, column
    names, then per-cell value equality on the canonicalized frames."""
    got = canonicalize(spark_df.toPandas())
    exp = canonicalize(oracle_pdf)
    if list(got.columns) != list(exp.columns):
        return False, f"columns differ: {list(got.columns)} vs {list(exp.columns)}"
    if len(got) != len(exp):
        return False, f"row count differs: {len(got)} vs {len(exp)}"
    for col in got.columns:
        gv = got[col].tolist()
        ev = exp[col].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            if not _cell_equal(a, b):
                return False, f"col {col} row {i}: {a!r} != {b!r}"
    return True, f"{len(got)} rows match"
