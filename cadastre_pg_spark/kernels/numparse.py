"""Lenient EDIGEO-style scalar parsing + validation.

- parse_edigeo_number: strip leading '+', orphan trailing '.', then
  float parse; '+1895.' -> 1895.0, '01' -> 1.0
  (reference cadastre-pg/src/cli.rs:842-861).
- validate_date: 'YYYY-MM', year 1900-2100, month 01-12
  (cli.rs:1093-1116).
- parse_coord_pair: '+881824.53;+6663821.17;' -> (x, y)
  (edigeo/src/parser/vec.rs:170-185, golden oracle vec.rs:454-461).

The same rules exist SQL-side as regexp_replace + cast expressions in
the engine's config-driven projection (operators/config_projection.py)
so the hot path stays JVM-side; these Python versions are the oracle.
"""

import re

_DATE_RE = re.compile(r"^(\d{4})-(\d{2})$")

# SQL-equivalent cleanup: regexp_replace(v, '^\+', '') then '\.$' -> ''
NUM_CLEAN_LEAD = r"^\+"
NUM_CLEAN_TRAIL = r"\.$"


def parse_edigeo_number(v: str):
    """Lenient numeric parse; returns float or None."""
    if v is None:
        return None
    s = v.strip()
    if s.startswith("+"):
        s = s[1:]
    if s.endswith("."):
        s = s[:-1]
    if not s:
        return None
    try:
        return float(s)
    except ValueError:
        return None


def parse_edigeo_int(v: str):
    f = parse_edigeo_number(v)
    return None if f is None else int(f)  # trunc, like the reference


def validate_date(v: str) -> bool:
    m = _DATE_RE.match(v or "")
    if not m:
        return False
    year, month = int(m.group(1)), int(m.group(2))
    return 1900 <= year <= 2100 and 1 <= month <= 12


def parse_coord_pair(v: str):
    """';'-separated signed coordinate pair."""
    parts = [p for p in (v or "").split(";") if p.strip()]
    if len(parts) < 2:
        return None
    x = parse_edigeo_number(parts[0])
    y = parse_edigeo_number(parts[1])
    if x is None or y is None:
        return None
    return (x, y)
