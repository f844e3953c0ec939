"""ANSI-SQL reconstruction of the deterministic pages table — the
DuckDB-oracle twin of data/pages.py::make_page + the byte-identical
text extraction (kernels/textextract.py).

make_page builds html whose canonical extraction is exactly
  "Page {i:08d} ({dep}) Page {i:08d} ({dep}) {body} & finé"
(title appears in <title> and <h1>; script/style/comment stripped;
&amp;/&eacute; resolved; whitespace collapsed) — asserted by
tests/test_generators.py byte-equality and re-derived here so the
oracle never runs the Python extractor.

All randomness is sha256-based (_h(i, salt) = little-endian uint64 of
the first 8 digest bytes), which DuckDB reproduces from its sha256 hex
string via per-byte strpos arithmetic in HUGEINT.
"""

from .pages import _DEPS, _WORDS


def _hle_sql(hex_expr: str) -> str:
    """Little-endian uint64 of the first 8 bytes of a sha256 hex string,
    as a HUGEINT expression (the SQL twin of pages._h)."""
    terms = []
    for j in range(8):
        pair = (
            f"((strpos('0123456789abcdef', substring({hex_expr}, {2 * j + 1}, 1)) - 1) * 16"
            f" + (strpos('0123456789abcdef', substring({hex_expr}, {2 * j + 2}, 1)) - 1))"
        )
        terms.append(f"CAST({pair} AS HUGEINT) * {256 ** j}")
    return "(" + " + ".join(terms) + ")"


def _h_sql(salt: int, i_expr: str) -> str:
    return _hle_sql(f"sha256('{salt}:' || CAST({i_expr} AS VARCHAR))")


def _dep_case_sql(idx_expr: str) -> str:
    """_DEPS[idx] for idx in 0..95: '01'..'19','21'..'95','2A','2B'."""
    assert len(_DEPS) == 96 and _DEPS[94] == "2A" and _DEPS[95] == "2B"
    return (
        f"(CASE WHEN {idx_expr} <= 18 THEN lpad(CAST({idx_expr} + 1 AS VARCHAR), 2, '0')"
        f" WHEN {idx_expr} <= 93 THEN lpad(CAST({idx_expr} + 2 AS VARCHAR), 2, '0')"
        f" WHEN {idx_expr} = 94 THEN '2A' ELSE '2B' END)"
    )


def _word_case_sql(val_expr: str) -> str:
    branches = " ".join(
        f"WHEN {k} THEN '{w}'" for k, w in enumerate(_WORDS)
    )
    return f"(CASE {val_expr} {branches} END)"


def pages_cte_sql(n_pages: int) -> str:
    """CTE chain producing pg(i, url, text_sha): the url and the sha256
    of the canonical extracted text for every page index."""
    dep_idx = f"CAST({_h_sql(1, 'i')} % {len(_DEPS)} AS BIGINT)"
    nw = f"CAST(8 + {_h_sql(3, 'i')} % 40 AS BIGINT)"
    word_val = f"CAST({_hle_sql('hx')} % {len(_WORDS)} AS BIGINT)"
    return f"""
        _pg0 AS (
          SELECT i,
                 {_dep_case_sql(dep_idx)} AS dep,
                 lpad(CAST(i AS VARCHAR), 8, '0') AS id8,
                 {nw} AS nw
          FROM range(0, {n_pages}) t(i)
        ),
        _pg1 AS (
          SELECT i, dep, id8,
                 array_to_string(
                   list_transform(
                     [sha256(CAST(100 + k AS VARCHAR) || ':' || CAST(i AS VARCHAR))
                      for k in range(0, nw)],
                     hx -> {_word_case_sql(word_val)}),
                   ' ') AS body
          FROM _pg0
        ),
        pg AS (
          SELECT i,
                 'https://dep' || dep || '.example.fr/p/' || id8 AS url,
                 sha256('Page ' || id8 || ' (' || dep || ') Page ' || id8
                        || ' (' || dep || ') ' || body || ' & finé') AS text_sha
          FROM _pg1
        )"""
