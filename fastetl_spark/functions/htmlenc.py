"""HTML entity encoding for accented text — reference
encode_html.py:replace_to_html_encode (used when rendering report/email
bodies whose transport cannot carry UTF-8).

The reference loops `html.entities.html5` doing sequential
str.replace calls, which can emit doubled semicolons for entity names
that already end in ';' and re-scans the string once per entity. This
version builds a single char -> '&name;' table (letters + the same
symbol set) and applies it in ONE pass via str.translate —
deterministic (shortest entity name wins ties) and immune to
double-encoding. Driver-side by design: it renders report text, not
row data; for column-level use wrap in a vectorized pandas UDF."""

from __future__ import annotations

import html.entities
import unicodedata

_SYMBOLS = '§ª°º˚"'


def _build_table() -> dict[int, str]:
    best: dict[str, str] = {}
    for entity, char in html.entities.html5.items():
        if len(char) != 1:
            continue
        if not (unicodedata.category(char) in ("Ll", "Lu") or char in _SYMBOLS):
            continue
        if char.isascii():
            continue
        name = entity.rstrip(";")
        if char not in best or (len(name), name) < (len(best[char]), best[char]):
            best[char] = name
    return {ord(c): f"&{name};" for c, name in best.items()}


_TABLE = _build_table()


def replace_to_html_encode(text: str) -> str:
    """Replace accented letters (and the reference's symbol set) with
    their named HTML entities; ASCII passes through untouched."""
    return text.translate(_TABLE)
