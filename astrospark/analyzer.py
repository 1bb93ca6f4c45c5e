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
from typing import NamedTuple

import numpy as np
import pandas as pd
import pyarrow as pa

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


class TokenBatch(NamedTuple):
    """Batch tokenization result over a list of unit texts (see
    ``tokenize_spans``). All arrays are aligned per token, in unit order."""

    codes: np.ndarray  # int64 distinct-token code per token
    uniq: pd.Series  # object Series of distinct token strings
    tok_len: np.ndarray  # int64 codepoint length per token
    unit_ids: np.ndarray  # int64 source-unit index per token
    char_start: np.ndarray  # int64 char offset of the token within its unit


# Per-process codepoint classification tables, grown on demand to the max
# codepoint seen. ``digit`` uses str.isdecimal(), which is exactly Unicode
# category Nd — the same set Python's regex ``\d`` matches on str (pinned by
# tests/test_analyzer.py::test_isdecimal_matches_regex_digit).
_CLS: dict = {"size": 0}


def _class_tables(maxcode: int) -> dict:
    """Return class tables covering codepoints [0, maxcode].

    Thread-safety contract (the HTTP service runs kernel calls on a
    ThreadingHTTPServer): callers index the RETURNED dict, never the
    module global, and a grower publishes a fully-built replacement dict
    with one atomic rebind — so a concurrent smaller publish can waste a
    rebuild but can never hand any caller an undersized or half-updated
    table (tests/test_analyzer.py::test_class_tables_concurrent_growth).
    """
    tables = _CLS  # snapshot — later swaps never mutate what we read
    size = max(maxcode + 1, 0x180)
    if size > tables["size"]:
        lo = tables["size"]
        # extend the expensive isdecimal table over [lo, size) only —
        # str.isdecimal is a per-codepoint Python call, and a full
        # rebuild from 0 re-pays ~130 ms whenever one astral char shows up
        grown = np.fromiter(
            (chr(c).isdecimal() for c in range(lo, size)), dtype=bool, count=size - lo
        )
        digit = np.concatenate((tables["digit"], grown)) if lo else grown
        delim = np.zeros(size, dtype=bool)
        for ch in DELIM_SET:
            if ord(ch) < size:
                delim[ord(ch)] = True
        cps = np.arange(size, dtype=np.uint32)
        alpha = ((cps >= 65) & (cps <= 90)) | ((cps >= 97) & (cps <= 122))
        tables = {"size": size, "delim": delim, "digit": digit, "alpha": alpha}
        globals()["_CLS"] = tables
    return tables


def tokenize_spans(texts: list[str]) -> TokenBatch:
    """Tokenize a whole batch of unit texts in one vectorized pass.

    Equivalent to ``[tokenize(t) for t in texts]`` (pinned by
    tests/test_analyzer.py fuzz), but ~5x faster: the texts are joined into
    one megastring with ``"\\n"`` separators — ``"\\n"`` is a delimiter, so it
    always forms its own single-char token and no token can cross it, making
    per-text tokenization and megastring tokenization provably identical —
    then token BOUNDARIES are computed with numpy char-class logic over the
    codepoint array (the two-phase split of AstroAnalyzer.java:44-56 reduces
    to: boundary at every delimiter edge, at ascii-letter->digit, and at
    digit->non-digit), and the token strings are materialized zero-copy as a
    pyarrow StringArray over the megastring's utf-8 buffer (tokens tile the
    text, so the boundary byte offsets ARE the arrow offsets buffer), which
    ``dictionary_encode`` then deduplicates in C++.

    Strings containing lone surrogates (e.g. ``surrogateescape``-decoded
    bytes) cannot round-trip through utf-32/utf-8 — those fall back to the
    per-text regex tokenizer with the same TokenBatch contract, matching
    the pre-vectorization behavior instead of failing the whole batch.
    (The Spark path can never carry them — Arrow validates utf-8 — and the
    HTTP service decodes with errors="replace"; downstream kernel string
    ops are arrow-backed and still require valid Unicode, exactly as they
    did before vectorization.)
    """
    mega = "\n".join(texts)
    try:
        encoded = mega.encode("utf-32-le")
    except UnicodeEncodeError:
        return _tokenize_spans_scalar(texts)
    codes32 = np.frombuffer(encoded, dtype=np.uint32)
    n_chars = len(codes32)
    empty = np.empty(0, dtype=np.int64)
    if n_chars == 0:
        return TokenBatch(empty, pd.Series([], dtype="object"), empty, empty, empty)
    cls = _class_tables(int(codes32.max()))
    is_delim = cls["delim"][codes32]
    is_digit = cls["digit"][codes32]
    is_alpha = cls["alpha"][codes32]
    bound = np.empty(n_chars, dtype=bool)
    bound[0] = True
    bound[1:] = (
        is_delim[:-1]
        | is_delim[1:]
        | (is_alpha[:-1] & is_digit[1:])
        | (is_digit[:-1] & ~is_digit[1:])
    )
    starts = np.flatnonzero(bound)  # codepoint offset of each token
    ends = np.concatenate((starts[1:], [n_chars]))

    # utf-8 byte offset of each token start: codepoint offset + the extra
    # bytes contributed by preceding non-ascii codepoints (sparse correction
    # — most corpora are ascii-dominated)
    utf8 = mega.encode("utf-8")
    non_ascii = np.flatnonzero(codes32 >= 0x80)
    if len(non_ascii) == 0:
        byte_starts = starts
    else:
        na_codes = codes32[non_ascii].astype(np.int64)
        extra = np.where(na_codes < 0x800, 1, np.where(na_codes < 0x10000, 2, 3))
        cum_extra = np.concatenate(([0], np.cumsum(extra)))
        byte_starts = starts + cum_extra[np.searchsorted(non_ascii, starts)]
    offsets = np.empty(len(starts) + 1, dtype=np.int64)
    offsets[:-1] = byte_starts
    offsets[-1] = len(utf8)
    arr = pa.LargeStringArray.from_buffers(
        len(starts), pa.py_buffer(offsets.tobytes()), pa.py_buffer(utf8)
    )
    enc = arr.dictionary_encode()
    all_codes = enc.indices.to_numpy().astype(np.int64)
    uniq = enc.dictionary.to_pandas().astype("object")

    # drop the separator tokens by POSITION (each separator is the 1-char
    # token starting exactly at unit boundary - 1)
    unit_len = np.fromiter(map(len, texts), dtype=np.int64, count=len(texts))
    unit_char_start = np.concatenate(([0], np.cumsum(unit_len + 1)))[:-1]
    sep_pos = unit_char_start[1:] - 1
    keep = np.ones(len(starts), dtype=bool)
    if len(sep_pos):
        sep_idx = np.searchsorted(starts, sep_pos)
        keep[sep_idx] = False
    tok_starts = starts[keep]
    unit_ids = np.searchsorted(unit_char_start, tok_starts, side="right") - 1
    return TokenBatch(
        all_codes[keep],
        uniq,
        (ends - starts)[keep],
        unit_ids,
        tok_starts - unit_char_start[unit_ids],
    )


def _tokenize_spans_scalar(texts: list[str]) -> TokenBatch:
    """Per-text regex fallback for inputs the megastring path can't encode
    (lone surrogates). Same TokenBatch contract; tokens tile each text, so
    char offsets are running sums of token lengths."""
    toks: list[str] = []
    uids: list[int] = []
    starts: list[int] = []
    for ui, t in enumerate(texts):
        pos = 0
        for tok in tokenize(t):
            toks.append(tok)
            uids.append(ui)
            starts.append(pos)
            pos += len(tok)
    empty = np.empty(0, dtype=np.int64)
    if not toks:
        return TokenBatch(empty, pd.Series([], dtype="object"), empty, empty, empty)
    # dict-based dedup, NOT pd.factorize: pandas' string hashtable keys by
    # a lossy utf-8 encoding, so DISTINCT lone-surrogate tokens silently
    # collide to one code (observed: '\ud800' and '\udcff\udcfe' factorize
    # equal) — exactly the inputs this fallback exists for
    idx: dict[str, int] = {}
    codes = np.fromiter(
        (idx.setdefault(t, len(idx)) for t in toks), dtype=np.int64, count=len(toks)
    )
    return TokenBatch(
        codes,
        pd.Series(list(idx.keys()), dtype="object"),
        np.fromiter(map(len, toks), dtype=np.int64, count=len(toks)),
        np.asarray(uids, dtype=np.int64),
        np.asarray(starts, dtype=np.int64),
    )


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
