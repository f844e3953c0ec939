"""Canonical html -> text extraction.

The engine's analog of the reference's encoding-aware decode
(edigeo/src/lib.rs:171-174 + charset map edigeo/src/parser/thf.rs:47-61):
raw bytes + a declared encoding in, canonical text out. The SAME pure
function is used by the distributed pandas-UDF path and by the
single-process oracle — per-url byte-identity of the output is the
engine's core per-row invariant (BASELINE.json input_hint).

Deterministic by construction: one regex pass set, no locale
dependence, explicit entity table, explicit whitespace collapse.
"""

import re

# charset label -> python codec: the FULL reference map
# (edigeo/src/parser/thf.rs:47-61). Reference quirks preserved:
# IRV / 646-FRANCE / 8859-1 decode as Latin-9 (French EDIGEO uses
# Latin-9 in practice) and 8859-9 decodes as windows-1254 (Turkish,
# ISO-8859-9-compatible superset). UTF-8 / ASCII / LATIN* aliases are
# engine extensions for the web-text graft.
ENCODINGS = {
    "IRV": "iso-8859-15",
    "646-FRANCE": "iso-8859-15",
    "8859-1": "iso-8859-15",
    "8859-2": "iso-8859-2",
    "8859-3": "iso-8859-3",
    "8859-4": "iso-8859-4",
    "8859-5": "iso-8859-5",
    "8859-6": "iso-8859-6",
    "8859-7": "iso-8859-7",
    "8859-8": "iso-8859-8",
    "8859-9": "cp1254",
    "8859-15": "iso-8859-15",
    # web-text extensions (not in thf.rs)
    "ASCII": "ascii",
    "LATIN1": "iso-8859-1",
    "LATIN9": "iso-8859-15",
    "UTF-8": "utf-8",
    "UTF8": "utf-8",
}
DEFAULT_ENCODING = "iso-8859-15"

_SCRIPT_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")

_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&eacute;", "é"),
    ("&egrave;", "è"),
    ("&agrave;", "à"),
    ("&ccedil;", "ç"),
    ("&amp;", "&"),  # last, so double-escapes resolve once
]


def resolve_encoding(label: str | None) -> str:
    if not label:
        return DEFAULT_ENCODING
    return ENCODINGS.get(label.strip().upper(), DEFAULT_ENCODING)


def extract_text(html: bytes, encoding: str | None = None) -> str:
    """Canonical extraction: decode -> strip script/style/comments ->
    strip tags -> resolve entities -> collapse whitespace -> strip."""
    codec = resolve_encoding(encoding) if (encoding is None or len(encoding) < 12) else encoding
    try:
        s = html.decode(codec, errors="replace")
    except LookupError:
        s = html.decode(DEFAULT_ENCODING, errors="replace")
    s = _COMMENT_RE.sub(" ", s)
    s = _SCRIPT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    s = _WS_RE.sub(" ", s)
    return s.strip()


def extract_text_series(htmls, encodings=None):
    """Vectorized-over-batch wrapper for pandas UDF use: list/Series of
    bytes (+ optional per-row encoding labels) -> list of str."""
    if encodings is None:
        return [extract_text(h) for h in htmls]
    return [extract_text(h, e) for h, e in zip(htmls, encodings)]
