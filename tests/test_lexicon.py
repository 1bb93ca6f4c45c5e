"""Gazetteer set + trie longest-match semantics (AstroLexicon.java:55-116)."""

import os

import pytest

from astrospark.analyzer import tokenize
from astrospark.lexicon import (
    build_trie,
    build_vocab,
    interval_bitmap,
    load_names,
    match_positions,
)

REF_LEXICON = "/root/reference/resources/lexicon/astroVoc.txt"


@pytest.fixture(scope="module")
def gaz():
    names = load_names()
    return build_vocab(names), build_trie(names)


def _match_texts(trie, text):
    toks = tokenize(text)
    return ["".join(toks[s : e + 1]) for s, e in match_positions(toks, trie)]


def test_vocab_excludes_single_chars(gaz):
    vocab, _ = gaz
    assert "M" not in vocab  # length>1 filter (AstroLexicon.java:81)
    assert "GRB" in vocab
    assert "Magellanic" in vocab
    assert "Clouds" in vocab


def test_longest_match_and_restart(gaz):
    _, trie = gaz
    text = "GRB 10002 and other GRBs, but also GRB 050219. Still we have Magellanic Clouds around and M4-37934 in the corner, of M 4 or other NGC."
    assert _match_texts(trie, text) == [
        "GRB", "GRBs", "GRB", "Magellanic Clouds", "M", "M", "NGC",
    ]


def test_multiword_longest_match(gaz):
    _, trie = gaz
    # longest match wins over prefix entry ("Magellanic Cloud" vs "...s"?)
    assert _match_texts(trie, "the Large Magellanic Cloud region") == ["Large Magellanic Cloud"]
    assert _match_texts(trie, "Magellanic Clouds") == ["Magellanic Clouds"]


def test_adjacent_matches(gaz):
    _, trie = gaz
    assert _match_texts(trie, "NGC GRB") == ["NGC", "GRB"]


def test_case_sensitive(gaz):
    _, trie = gaz
    assert _match_texts(trie, "grb and ngc") == []


def test_whitespace_skipped_inside_match(gaz):
    _, trie = gaz
    # NBSP between tokens of a multiword name must not break the match
    assert _match_texts(trie, "Magellanic\u00A0Clouds") == ["Magellanic\u00A0Clouds"]


def test_interval_bitmap(gaz):
    _, trie = gaz
    toks = tokenize("see Magellanic Clouds here")
    pos = match_positions(toks, trie)
    mask = interval_bitmap(len(toks), pos)
    assert mask.tolist() == [False, False, True, True, True, False, False]


@pytest.mark.skipif(not os.path.exists(REF_LEXICON), reason="reference lexicon unavailable")
def test_reference_lexicon_regression():
    """Empirical pin against the REAL reference lexicon file. Note: the
    reference's own (disabled) AstroLexiconTest expected 8/1/1/2 — those
    counts are unreachable with the shipped astroVoc.txt (no 'GRBs'/'M4'
    entries); these are the counts our documented semantics produce."""
    names = [l.rstrip("\n") for l in open(REF_LEXICON, encoding="utf-8") if l.strip()]
    trie = build_trie(names)
    t1 = "GRB 10002 and other GRBs, but also GRB 050219. Still we have Magellanic Clouds around and M4-37934 in the corner, of M 4 or other NGC."
    assert _match_texts(trie, t1) == ["GRB", "GRB", "Magellanic Clouds", "NGC"]
    assert _match_texts(trie, "GRBs") == []
    assert _match_texts(trie, "there is M4-37934 in the corner") == []
