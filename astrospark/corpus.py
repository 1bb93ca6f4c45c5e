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
    # annotated shapes from the reference's evaluation corpus
    # (resources/dataset/astro/evaluation/sample.tei.xml)
    "Based on observations collected with ATCA under {EID} , and at VLA under {EID} .",
    "We detect only one of our targets , namely {E} with a measured flux F( {N} GHz ) = {N} ± {N} μJy .",
    "The exceptions are {EGRBS} ( see below ) .",
    "{E} was detected , but {E2} was not among the targets .",
)

# hard negatives: numeric/instrument/citation patterns that must NOT be
# labeled (these are the false-positive shapes of the reference's own test
# paragraph, src/test/resources/text.txt)
_NEG_TEMPLATES = (
    "It is thus listed separately at the end of Table {N} , which lists the details of all our {N} observed sources .",
    "We detect it at {N}σ at {N} GHz , at about {N} yr after the burst .",
    "We argue that a good fraction of this emission , if not all , is due to afterglow emission .",
    "adding it to the group of GRBs with very long-lasting detected radio afterglows .",
    "where the most prominent example is discussed ( van der Horst et al. {Y} ) .",
    "an afterglow interpretation has been excluded ( Michałowski et al. {Y} ) .",
    "with a radio-bright knot at the GRB position , an afterglow interpretation has been excluded .",
    "The peak of the radio emission is at RA ( 2000.0 ) = {H2}:{H2}:{H2}.{H2} , Dec ( 2000 ) = +{H2}:{H2}:{H2}.{N} with an error of 0 . {N} .",
    "With ATCA , we observed our sample sources ( project C{N4} ; PI : J. Greiner ) with the CFB 1M-0.5K mode in the {N} km configuration .",
    "providing {N4} channels per {N4} MHz continuum IF ( {N} MHz resolution ) and {N4} channels per {N} MHz zoom band ( 0.5 kHz resolution ) .",
    "Most sources were observed over the full range of hour angles to ensure good uv-plane coverage .",
    "see Figure {N} and Table {N} for the light curve at {N} GHz .",
    "a measured flux F( {N} GHz ) = {N} ± {N} μJy at the {N}σ level .",
    "neither the SFR nor mass was known at the time of observation .",
    "but was observed as an ATCA filler target in otherwise not usable gaps .",
    # bare acronym as modifier — not an object mention
    "GRB hosts of our sample have an extent smaller than about {N} arcsec .",
    "the GRB sample includes several long-lasting radio afterglows .",
    "GRB afterglows fade on a timescale of {N} days .",
)

# sentence-initial conjunction homographs of gazetteer entries ("And" is
# also the IAU abbreviation of Andromeda) — the conjunction must stay
# outside the adjacent entity
_AND_TEMPLATES = (
    "And {E} appears in the same field .",
    "And {E} there .",
    "And the source was not detected at {N} GHz .",
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


_PLACEHOLDER = __import__("re").compile(r"\{(E2|EID|EGRBS|E|N4|N|Y|H2)\}")


def _fill(tpl: str, rng: np.random.Generator, base: int, spans: list[tuple[int, int]]) -> str:
    """Fill one template; entity placeholders append (start, end) char
    spans (absolute, offset by ``base``)."""
    out: list[str] = []
    pos = 0
    cur = 0
    for m in _PLACEHOLDER.finditer(tpl):
        out.append(tpl[pos : m.start()])
        cur = base + sum(len(p) for p in out)
        kind = m.group(1)
        if kind in ("E", "E2"):
            ent = _entity(rng)
            spans.append((cur, cur + len(ent)))
            out.append(ent)
        elif kind == "EID":
            if rng.integers(0, 2) == 0:
                ent = f"ID {chr(ord('A') + int(rng.integers(0, 26)))}{rng.integers(1000, 9999)}"
            else:
                ent = f"ID {rng.integers(10, 20)}B-{rng.integers(100, 999):03d}"
            spans.append((cur, cur + len(ent)))
            out.append(ent)
        elif kind == "EGRBS":
            # "GRBs 020819B, 050219, and 110918A" — each id its own span
            # (sample.tei.xml annotation shape)
            ids = [
                f"{rng.integers(10000, 999999):06d}{chr(ord('A') + int(rng.integers(0, 4))) if rng.integers(0, 2) else ''}"
                for _ in range(int(rng.integers(2, 5)))
            ]
            first = f"GRBs {ids[0]}"
            spans.append((cur, cur + len(first)))
            out.append(first)
            for j, gid in enumerate(ids[1:]):
                sep = ", " if j < len(ids) - 2 else ", and "
                out.append(sep)
                cur = base + sum(len(p) for p in out)
                spans.append((cur, cur + len(gid)))
                out.append(gid)
        elif kind == "N":
            out.append(str(int(rng.integers(2, 90))))
        elif kind == "N4":
            out.append(str(int(rng.integers(1000, 4000))))
        elif kind == "Y":
            out.append(str(int(rng.integers(1980, 2026))))
        elif kind == "H2":
            out.append(f"{int(rng.integers(0, 60)):02d}")
        pos = m.end()
    out.append(tpl[pos:])
    return "".join(out)


def make_paragraph(rng: np.random.Generator) -> tuple[str, list[tuple[int, int]]]:
    """One annotated paragraph: (text, [(char_start, char_end), ...])."""
    n_sent = int(rng.integers(1, 5))
    parts: list[str] = []
    spans: list[tuple[int, int]] = []
    pos = 0
    for _s in range(n_sent):
        r = rng.random()
        if r < 0.55:
            tpl = _SENT_TEMPLATES[int(rng.integers(0, len(_SENT_TEMPLATES)))]
        elif r < 0.78:
            tpl = _NEG_TEMPLATES[int(rng.integers(0, len(_NEG_TEMPLATES)))]
        elif r < 0.82:
            tpl = _AND_TEMPLATES[int(rng.integers(0, len(_AND_TEMPLATES)))]
        else:
            k = int(rng.integers(5, 14))
            words = [str(_FILLER[int(rng.integers(0, len(_FILLER)))]) for _ in range(k)]
            tpl = " ".join(words) + " ."
        sent = _fill(tpl, rng, pos, spans)
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
