"""Deterministic synthetic annotated corpus (training + eval + fixtures).

The reference trains from TEI files with inline <rs type="astro-object">
annotations (/root/reference/resources/dataset/astro/evaluation/sample.tei.xml,
label encoding I-<object>/<object>/<other> per
/root/reference/src/main/java/org/grobid/trainer/AstroAnnotationSaxHandler.java:157-162)
— but ships an EMPTY corpus directory and no model binary. So the engine's
model is trained on this seeded synthetic corpus: natural-text sentence
templates (patterned after the style of the reference's test paragraph
src/test/resources/text.txt) with astronomical designations mixed in from
our gazetteer. Everything is driven by numpy's seeded Generator —
bit-for-bit reproducible.
"""

from __future__ import annotations

import numpy as np

from astrospark.analyzer import tokenize

_FILLER = (
    "we detect the source at about radio emission afterglow observed with array "
    "telescope data flux measured during survey field deep image spectrum line "
    "velocity redshift galaxy cluster star formation rate mass luminosity "
    "distance sample target position region band frequency observation epoch "
    "light curve burst host counterpart candidate catalog follow up analysis "
    "model fit results table figure section shows lists present report paper "
    "previous studies confirmed detection significant emission consistent"
).split()

_SENT_TEMPLATES = (
    "We detect {E} at {N} GHz , at about {N} yr after the burst .",
    "The host galaxy of {E} was observed as a filler target .",
    "{E} is the most prominent example in our sample .",
    "In a similar case , {E} , an afterglow interpretation has been excluded .",
    "{E} was not among the originally proposed targets .",
    "Based on observations collected under {E} , we report the detection .",
    "The peak of the radio emission of {E} is consistent with {E2} .",
    "Among the {N} observed sources , only {E} shows significant emission .",
    "A comparison between {E} and {E2} lists the details of all sources .",
    "The field around {E} contains several known objects including {E2} .",
)

_GREEK = ("Alpha", "Beta", "Gamma", "Delta", "Epsilon", "Zeta", "Eta", "Theta",
          "Iota", "Kappa", "Lambda", "Mu", "Nu", "Xi", "Omicron", "Pi", "Rho",
          "Sigma", "Tau", "Upsilon", "Phi", "Chi", "Psi", "Omega")

_CONSTELLATIONS = (
    "Centauri", "Cygni", "Orionis", "Tauri", "Lyrae", "Aquilae", "Persei",
    "Andromedae", "Draconis", "Eridani", "Ceti", "Scorpii", "Geminorum",
)

_NAMED = (
    "Crab Nebula", "Orion Nebula", "Eagle Nebula", "Ring Nebula",
    "Helix Nebula", "Tarantula Nebula", "Large Magellanic Cloud",
    "Small Magellanic Cloud", "Magellanic Clouds", "Andromeda Galaxy",
    "Whirlpool Galaxy", "Milky Way", "Omega Centauri", "Cygnus X-1",
    "Vela Pulsar", "Crab Pulsar", "Sagittarius A", "Cas A",
)


def _entity(rng: np.random.Generator) -> str:
    kind = rng.integers(0, 10)
    if kind == 0:
        suffix = "" if rng.integers(0, 2) == 0 else chr(ord("A") + int(rng.integers(0, 4)))
        return f"GRB {rng.integers(10000, 999999):06d}{suffix}"
    if kind == 1:
        return f"NGC {rng.integers(1, 7841)}"
    if kind == 2:
        return f"M {rng.integers(1, 111)}"
    if kind == 3:
        return f"IC {rng.integers(1, 5387)}"
    if kind == 4:
        return f"HD {rng.integers(1, 359084)}"
    if kind == 5:
        sign = "+" if rng.integers(0, 2) == 0 else "-"
        return f"PSR J{rng.integers(0, 24):02d}{rng.integers(0, 60):02d}{sign}{rng.integers(0, 90):02d}{rng.integers(0, 60):02d}"
    if kind == 6:
        return f"SN {rng.integers(1900, 2025)}{chr(ord('A') + int(rng.integers(0, 26)))}"
    if kind == 7:
        return f"Abell {rng.integers(1, 4077)}"
    if kind == 8:
        return str(_NAMED[int(rng.integers(0, len(_NAMED)))])
    return f"{_GREEK[int(rng.integers(0, len(_GREEK)))]} {_CONSTELLATIONS[int(rng.integers(0, len(_CONSTELLATIONS)))]}"


def make_paragraph(rng: np.random.Generator) -> tuple[str, list[tuple[int, int]]]:
    """One annotated paragraph: (text, [(char_start, char_end), ...])."""
    n_sent = int(rng.integers(1, 5))
    parts: list[str] = []
    spans: list[tuple[int, int]] = []
    pos = 0
    for _s in range(n_sent):
        if rng.random() < 0.65:
            tpl = _SENT_TEMPLATES[int(rng.integers(0, len(_SENT_TEMPLATES)))]
        else:
            k = int(rng.integers(5, 14))
            words = [str(_FILLER[int(rng.integers(0, len(_FILLER)))]) for _ in range(k)]
            tpl = " ".join(words) + " ."
        sent_parts: list[str] = []
        i = 0
        while i < len(tpl):
            if tpl.startswith("{E2}", i) or tpl.startswith("{E}", i):
                ent = _entity(rng)
                cur = pos + sum(len(p) for p in sent_parts)
                spans.append((cur, cur + len(ent)))
                sent_parts.append(ent)
                i += 4 if tpl.startswith("{E2}", i) else 3
            elif tpl.startswith("{N}", i):
                sent_parts.append(str(int(rng.integers(2, 90))))
                i += 3
            else:
                sent_parts.append(tpl[i])
                i += 1
        sent = "".join(sent_parts)
        parts.append(sent)
        pos += len(sent) + 1  # joining space
    return " ".join(parts), spans


def gold_labels(text: str, char_spans: list[tuple[int, int]]):
    """Tokenize and produce gold labels over ELIGIBLE tokens.

    Label encoding per AstroAnnotationSaxHandler.java:157-162: first token of
    an entity = I-<object> (id 1), following = <object> (id 2), rest id 0.
    Returns (tokens, eligible_indices, labels) with eligibility mirroring
    AstroParser.addFeatures (skip ' '/'\\n'/empty-after-normalization).
    """
    from astrospark.oracle import java_trim  # local import to avoid cycle
    from astrospark.unicode_norm import normalize_and_remove_spaces

    tokens = tokenize(text)
    starts = np.cumsum([0] + [len(t) for t in tokens])[:-1]
    eligible: list[int] = []
    labels: list[int] = []
    span_idx = 0
    prev_span = -1
    for i, tok in enumerate(tokens):
        if tok == " " or tok == "\n":
            continue
        if java_trim(normalize_and_remove_spaces(tok)) == "":
            continue
        cs = int(starts[i])
        while span_idx < len(char_spans) and char_spans[span_idx][1] <= cs:
            span_idx += 1
        inside = span_idx < len(char_spans) and char_spans[span_idx][0] <= cs < char_spans[span_idx][1]
        eligible.append(i)
        if inside and span_idx == prev_span:
            labels.append(2)  # <object> continuation
        elif inside:
            labels.append(1)  # I-<object> begins the entity
        else:
            labels.append(0)
        prev_span = span_idx if inside else -1
    return tokens, eligible, labels


def make_corpus(n_paragraphs: int, seed: int = 42):
    """List of (text, char_spans) paragraphs, deterministic in seed."""
    rng = np.random.default_rng(seed)
    return [make_paragraph(rng) for _ in range(n_paragraphs)]
