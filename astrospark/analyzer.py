"""Tokenizer reproducing the reference analyzer semantics.

Reference: /root/reference/src/main/java/org/grobid/core/analyzers/AstroAnalyzer.java:44-80
  - ``DELIMITERS`` (lines 44-54): every delimiter character is emitted as its
    own single-character token (Java ``StringTokenizer(text, DELIMITERS, true)``).
  - ``REGEX`` (line 56): each non-delimiter run is further split at
    ascii-letter->digit and digit->non-digit boundaries (``M4`` -> ``M``,``4``;
    ``4σ`` -> ``4``,``σ``; ``σ4`` stays one token).

Implemented as ONE precompiled alternation regex so the Spark kernel can
tokenize a whole Arrow batch with ``pandas.Series.str.findall`` (vectorized,
no per-row Python loop): a token is either
  1. an optionally-prefixed digit run ``(?:[^D\\d]*[^D a-zA-Z \\d])?\\d+``
     (the prefix case covers non-ascii-letter chars glued to digits, e.g.
     ``σ4``),
  2. a maximal non-delimiter non-digit run, or
  3. a single delimiter char.
The alternation is provably equivalent to tokenize-then-split (see
tests/test_analyzer.py which cross-checks against a literal char-loop
rendition on adversarial inputs).
"""

from __future__ import annotations

import re

# Exact transcription of AstroAnalyzer.DELIMITERS (AstroAnalyzer.java:44-54),
# written with explicit escapes so every character is auditable.
DELIMITERS = (
    " \u000A\u000D\u0009([^%\u2030\u00B0,:"
    ";?.!/)-\u2013\u2212=\u2248<"
    ">+\u0022\u201C\u201D\u2018\u2019'`$]*"
    "\u2666\u2665\u2663\u2660\u00A0-\u2010\u2011\u2012\u2013\u2014\u2015"
    "\u207B\u208B\u2212\u0096\u058A\u2043\uFE58\uFE63\uFF0D+.\u2024"
    "\u2027\u2219\uFE52'\u2032\uFF07<=> \u00A0\u2000"
    "\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200A\u202F\u205F"
    "\u3000\uF0A0"
)

DELIM_SET = frozenset(DELIMITERS)

# AstroAnalyzer.java:56 — split between ascii letter and digit, digit and non-digit.
LETTER_DIGIT_SPLIT = re.compile(r"(?<=[a-zA-Z])(?=\d)|(?<=\d)(?=\D)")

_D = re.escape("".join(sorted(DELIM_SET)))
# Order of alternatives matters: digit-run (with optional non-ascii-letter glue
# prefix) first, then plain runs, then single delimiter chars.
TOKEN_PATTERN = (
    "(?:[^" + _D + r"\d]*[^" + _D + r"a-zA-Z\d])?\d+"
    "|[^" + _D + r"\d]+"
    "|[" + _D + "]"
)
TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize(text: str) -> list[str]:
    """Tokenize like AstroAnalyzer.tokenize (AstroAnalyzer.java:62-80)."""
    return TOKEN_RE.findall(text)


def tokenize_reference_port(text: str) -> list[str]:
    """Literal two-phase rendition (StringTokenizer + split) used ONLY by the
    tests to prove TOKEN_RE equivalence. Not on any hot path."""
    out: list[str] = []
    buf: list[str] = []

    def flush() -> None:
        if buf:
            out.extend(p for p in LETTER_DIGIT_SPLIT.split("".join(buf)) if p)
            buf.clear()

    for ch in text:
        if ch in DELIM_SET:
            flush()
            out.append(ch)
        else:
            buf.append(ch)
    flush()
    return out
