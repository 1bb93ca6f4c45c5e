"""Per-token Unicode normalization.

Rendition of the behavior the reference relies on at
/root/reference/src/main/java/org/grobid/core/engines/AstroParser.java:638-642
(``UnicodeUtil.normaliseTextAndRemoveSpaces`` from grobid-core): before
featurizing, each token is normalized — exotic spaces collapse to ASCII
space (then removed), hyphen/dash variants collapse to ``-``, single-quote
variants to ``'``, double-quote variants to ``"``, one-dot leaders to
``.`` — and tokens that become empty are skipped (but still advance the
match-position cursor).

Because the engine's tokens are single delimiter chars or delimiter-free
runs, only the variant classes below can actually occur inside a token.
The mapping is defined here once and shared by the oracle and the Spark
kernel (built as a ``str.translate`` table → vectorized via
``pandas.Series.str.translate``).
"""

from __future__ import annotations

# space variants -> removed (normalised to ' ' then spaces are removed)
_SPACES = "\u00A0\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200A\u202F\u205F\u3000\uF0A0\u0009\u000A\u000D\u000B\u000C"
# dash variants -> '-'
_DASHES = "\u2010\u2011\u2012\u2013\u2014\u2015\u207B\u208B\u2212\u058A\u2043\uFE58\uFE63\uFF0D\u0096"
# single-quote variants -> "'"
_SQUOTES = "\u2018\u2019\u201A\u201B\u2032\uFF07\u0060\u00B4"
# double-quote variants -> '"'
_DQUOTES = "\u201C\u201D\u00AB\u00BB\u2033"
# one-dot leader / bullet variants -> '.'
_DOTS = "\u2024\u2027\u2219\uFE52"
# zero-width / soft hyphen / BOM -> removed
_ZERO_WIDTH = "\u200B\u200C\u200D\uFEFF\u00AD"

NORMALIZE_TABLE: dict[int, str | None] = {}
for _c in _SPACES + " ":
    NORMALIZE_TABLE[ord(_c)] = None  # removed (normalise-and-REMOVE-spaces)
for _c in _DASHES:
    NORMALIZE_TABLE[ord(_c)] = "-"
for _c in _SQUOTES:
    NORMALIZE_TABLE[ord(_c)] = "'"
for _c in _DQUOTES:
    NORMALIZE_TABLE[ord(_c)] = '"'
for _c in _DOTS:
    NORMALIZE_TABLE[ord(_c)] = "."
for _c in _ZERO_WIDTH:
    NORMALIZE_TABLE[ord(_c)] = None


def normalize_and_remove_spaces(token: str) -> str:
    """Normalize one token; empty result means 'skip this token'."""
    return token.translate(NORMALIZE_TABLE)
