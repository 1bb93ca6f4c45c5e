"""Tokenizer fidelity (FIXTURES.md §5; AstroAnalyzer.java:44-56 semantics)."""

import numpy as np
import pytest

import re

from astrospark.analyzer import (
    DELIM_SET,
    tokenize,
    tokenize_reference_port,
    tokenize_spans,
)

CASES = [
    ("GRB 10002 and other GRBs, but also GRB 050219.", None),
    ("GRBs.", ["GRBs", "."]),
    ("there is M4-37934 in the corner",
     ["there", " ", "is", " ", "M", "4", "-", "37934", " ", "in", " ", "the", " ", "corner"]),
    ("4σ at 3 GHz", ["4", "σ", " ", "at", " ", "3", " ", "GHz"]),
    ("M4", ["M", "4"]),
    ("ab12cd34", ["ab", "12", "cd", "34"]),
    ("σ4x", ["σ4", "x"]),  # non-ascii letter glued to digits: no split before 4
    ("aβ3x", ["aβ3", "x"]),
    ("x–y", ["x", "–", "y"]),  # en-dash is a delimiter
    ("", []),
    ("   ", [" ", " ", " "]),
    ("(a)[b]", ["(", "a", ")", "[", "b", "]"]),
]


@pytest.mark.parametrize("text,expected", CASES)
def test_pinned_tokens(text, expected):
    got = tokenize(text)
    assert got == tokenize_reference_port(text)
    if expected is not None:
        assert got == expected


def test_tokens_tile_text():
    for text, _ in CASES:
        assert "".join(tokenize(text)) == text


def test_regex_equivalence_fuzz():
    rng = np.random.default_rng(123)
    alphabet = list("abXY09σβ日 .,-–()[]\"'`\n\t/+=<>") + [" ", "−", " "]
    for _ in range(300):
        s = "".join(rng.choice(alphabet, size=rng.integers(0, 40)))
        assert tokenize(s) == tokenize_reference_port(s), repr(s)


def test_delimiter_set_size():
    # 75 unique delimiter chars transcribed from AstroAnalyzer.java:44-54
    assert len(DELIM_SET) == 75
    for ch in " \n\r\t()[]^%,:;?.!/-–−=≈<>+\"“”‘’'`$*":
        assert ch in DELIM_SET


def test_isdecimal_matches_regex_digit():
    # tokenize_spans' digit class table uses str.isdecimal(); the scalar
    # tokenizer's phase-2 split uses regex \d (Unicode Nd on str). These
    # must agree on every codepoint the class table can ever cover.
    digit_re = re.compile(r"\d")
    for c in range(0x11000):  # BMP + a page of astral digits' neighborhood
        ch = chr(c)
        assert ch.isdecimal() == bool(digit_re.fullmatch(ch)), hex(c)
    # astral-plane decimal digits (e.g. MATHEMATICAL BOLD DIGITS U+1D7CE..)
    for c in list(range(0x1D7CE, 0x1D800)) + [0x104A0, 0x16A60]:
        ch = chr(c)
        assert ch.isdecimal() == bool(digit_re.fullmatch(ch)), hex(c)


def _spans_to_token_lists(texts):
    """Reconstruct per-text token lists from a TokenBatch."""
    batch = tokenize_spans(texts)
    uniq = batch.uniq.to_numpy(dtype=object)
    lists = [[] for _ in texts]
    for code, uid in zip(batch.codes.tolist(), batch.unit_ids.tolist()):
        lists[uid].append(uniq[code])
    return batch, lists


def test_tokenize_spans_matches_per_text():
    texts = [t for t, _ in CASES]
    batch, lists = _spans_to_token_lists(texts)
    for t, got in zip(texts, lists):
        assert got == tokenize(t), repr(t)
    # char_start/tok_len tile each unit text exactly, in order
    for uid, text in enumerate(texts):
        m = batch.unit_ids == uid
        starts = batch.char_start[m]
        lens = batch.tok_len[m]
        pos = 0
        for s, ln in zip(starts.tolist(), lens.tolist()):
            assert s == pos
            pos += ln
        assert pos == len(text)


def test_tokenize_spans_fuzz():
    rng = np.random.default_rng(987)
    # includes astral-plane char (4-byte utf-8), astral digit, non-ascii
    # letters/digits, NBSP and unicode dashes — exercises the byte-offset
    # correction and every boundary rule
    alphabet = list("abXY09σβ٣日 .,-–()[]\"'`\n\t/+=<>𝟒😀 −") + [" "]
    for trial in range(200):
        n_texts = int(rng.integers(0, 6))
        texts = [
            "".join(rng.choice(alphabet, size=rng.integers(0, 30)))
            for _ in range(n_texts)
        ]
        _, lists = _spans_to_token_lists(texts)
        for t, got in zip(texts, lists):
            assert got == tokenize(t), (trial, repr(t))


def test_tokenize_spans_empty_and_blank_units():
    texts = ["", "a b", "", "", "\n\n", "M4"]
    _, lists = _spans_to_token_lists(texts)
    for t, got in zip(texts, lists):
        assert got == tokenize(t), repr(t)


def test_tokenize_spans_lone_surrogate_fallback():
    # surrogateescape-decoded bytes produce lone surrogates that utf-32/
    # utf-8 refuse to encode; the batch path must fall back to the per-text
    # regex tokenizer instead of raising for the whole batch
    texts = ["M4 \ud800 end", "plain GRB 050219", "", "\udcff\udcfe"]
    _, lists = _spans_to_token_lists(texts)
    for t, got in zip(texts, lists):
        assert got == tokenize(t), repr(t)


def test_class_tables_concurrent_growth():
    # the class-table cache is shared across the ThreadingHTTPServer's
    # request threads: hammer it from many threads with interleaved small
    # (ascii) and large (astral) maxcodes — the pre-fix check-then-update
    # cache let a small publish land after a large one and crash an
    # in-flight gather with IndexError
    import threading

    import astrospark.analyzer as A

    errors: list[BaseException] = []
    barrier = threading.Barrier(8)

    def worker(seed: int) -> None:
        rng = np.random.default_rng(seed)
        try:
            barrier.wait()
            for _ in range(300):
                A._CLS = {"size": 0}  # force rebuild races
                if rng.integers(0, 2):
                    texts = ["ascii only M4"]
                else:
                    texts = ["astral \U0001F600 GRB 050219"]
                batch = tokenize_spans(texts)
                assert len(batch.codes) == len(tokenize(texts[0]))
        except BaseException as e:  # noqa: BLE001 — collect for main thread
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[0]


def test_class_tables_incremental_growth_consistent():
    # growing in steps must yield the same digit table as one big build
    import astrospark.analyzer as A

    A._CLS = {"size": 0}
    small = A._class_tables(0x200)
    stepped = A._class_tables(0x11000)
    A._CLS = {"size": 0}
    direct = A._class_tables(0x11000)
    assert stepped["size"] == direct["size"]
    assert np.array_equal(stepped["digit"], direct["digit"])
    assert np.array_equal(stepped["delim"], direct["delim"])
    assert np.array_equal(stepped["alpha"], direct["alpha"])
    assert small["size"] >= 0x201  # snapshot the caller got stays valid
