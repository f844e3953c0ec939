"""Text extraction kernel: determinism + encoding handling
(the byte-identical per-url invariant, BASELINE.json input_hint)."""

import hashlib

from cadastre_pg_spark.kernels.textextract import (
    DEFAULT_ENCODING,
    extract_text,
    extract_text_series,
    resolve_encoding,
)


def test_resolve_encoding():
    assert resolve_encoding(None) == DEFAULT_ENCODING
    assert resolve_encoding("UTF-8") == "utf-8"
    assert resolve_encoding("latin9") == "iso-8859-15"
    assert resolve_encoding("nonsense") == DEFAULT_ENCODING


def test_extract_basic():
    html = b"<html><body><h1>Title</h1><p>Hello   world</p></body></html>"
    assert extract_text(html) == "Title Hello world"


def test_extract_strips_script_style_comments():
    html = (
        b"<html><script>var x = '<p>no</p>';</script>"
        b"<style>p { color: red }</style>"
        b"<!-- secret --><p>kept</p></html>"
    )
    assert extract_text(html) == "kept"


def test_extract_entities_and_encoding():
    html = "<p>caf\xe9 &amp; cr&egrave;me &lt;3</p>".encode("iso-8859-15")
    assert extract_text(html, "8859-15") == "café & crème <3"
    html_utf8 = "<p>café</p>".encode("utf-8")
    assert extract_text(html_utf8, "UTF-8") == "café"


def test_extract_deterministic_bytes():
    html = "<div>d\xe9terministe  \n\t ok</div>".encode("iso-8859-15")
    h1 = hashlib.sha256(extract_text(html).encode("utf-8")).hexdigest()
    h2 = hashlib.sha256(extract_text(html).encode("utf-8")).hexdigest()
    assert h1 == h2
    out = extract_text_series([html, html], ["8859-15", "8859-15"])
    assert out[0] == out[1] == "déterministe ok"
