"""Tokenizer fidelity (FIXTURES.md §5; AstroAnalyzer.java:44-56 semantics)."""

import numpy as np
import pytest

from astrospark.analyzer import DELIM_SET, tokenize, tokenize_reference_port

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
