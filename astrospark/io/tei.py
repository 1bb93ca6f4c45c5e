"""TEI/XML sources and sinks (SURVEY.md §2.1 S3/S6, §2.2 P6).

S3  — chunk source: pull paragraph text chunks out of TEI/XML, whitespace-
      normalized, mirroring grobid-core's TextChunkSaxHandler
      (/root/reference/src/main/java/org/grobid/core/sax/TextChunkSaxHandler.java:29-88):
      every <p>/<paragraph> subtree yields one chunk; all whitespace runs
      collapse to single spaces.
S6  — TEI training sink: paragraphs with inline <rs type="astro-object">
      annotations (AstroParser.trainingExtraction, AstroParser.java:754-778).
P6  — training-label filters (AstroTrainer.java:262-284): an entity whose
      first token is "(" is dropped; trailing ";" "." "," are stripped
      (with their preceding whitespace) from entity spans.

stdlib xml.etree only — no external XML deps.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

_WS_RUN = re.compile(r"\s+")
_P_TAGS = {"p", "paragraph"}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def tei_chunks(xml_text: str) -> list[str]:
    """Paragraph text chunks, whitespace-normalized (S3)."""
    root = ET.fromstring(xml_text)
    chunks: list[str] = []
    for el in root.iter():
        if _local(el.tag) in _P_TAGS:
            text = "".join(el.itertext())
            norm = _WS_RUN.sub(" ", text).strip()
            if norm:
                chunks.append(norm)
    return chunks


def tei_typed_annotations(
    xml_text: str,
) -> list[tuple[str, list[tuple[int, int, str]]]]:
    """(paragraph_text, [(char_start, char_end, rs_type), ...]) per <p>,
    reading EVERY inline <rs> regardless of type — the corpus-lint reader
    (the reference's consistency checker, scripts/consistency.py:96-116,
    collects all rs types to flag cross-type ambiguity). Offsets index
    the normalized paragraph text."""
    root = ET.fromstring(xml_text)
    out = []
    for el in root.iter():
        if _local(el.tag) not in _P_TAGS:
            continue
        parts: list[str] = []
        spans: list[tuple[int, int, str]] = []
        pos = 0

        def push(txt: str | None) -> None:
            nonlocal pos
            if txt:
                norm = _WS_RUN.sub(" ", txt)
                parts.append(norm)
                pos += len(norm)

        push(el.text)
        for child in el:
            if _local(child.tag) == "rs":
                ent = _WS_RUN.sub(" ", "".join(child.itertext()))
                spans.append((pos, pos + len(ent), child.get("type") or ""))
                parts.append(ent)
                pos += len(ent)
            else:
                push("".join(child.itertext()))
            push(child.tail)
        text = "".join(parts)
        # align with the chunk normalization: strip, shifting spans
        lead = len(text) - len(text.lstrip())
        text = text.strip()
        spans = [
            (max(s - lead, 0), min(e - lead, len(text)), t)
            for s, e, t in spans
            if e - lead > 0
        ]
        if text:
            out.append((text, spans))
    return out


def tei_annotated_paragraphs(xml_text: str) -> list[tuple[str, list[tuple[int, int]]]]:
    """(paragraph_text, [(char_start, char_end), ...]) per <p>, reading
    inline <rs type="astro-object"> annotations (the training-corpus reader,
    AstroAnnotationSaxHandler.java:94-162). Offsets index the normalized
    paragraph text."""
    return [
        (text, [(s, e) for s, e, t in spans if t == "astro-object"])
        for text, spans in tei_typed_annotations(xml_text)
    ]


def apply_training_label_filters(text: str, spans: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """P6 (AstroTrainer.java:262-284): drop '('-initial entities; strip
    trailing ';' '.' ',' (and whitespace before them) from entity spans."""
    out = []
    for s, e in spans:
        e = min(e, len(text))
        if text[s:s + 1] == "(":
            continue
        while e > s and text[e - 1] in ";.,":
            e -= 1
            while e > s and text[e - 1] == " ":
                e -= 1
        if e > s:
            out.append((s, e))
    return out


def training_tei(paragraphs: list[tuple[str, list[tuple[int, int]]]], doc_id: int = 1) -> str:
    """S6: render annotated paragraphs as a TEI training file
    (trainingExtraction/getTEIHeader shape, AstroParser.java:754-818 —
    content only; no timestamps, so output is deterministic)."""
    body = []
    for text, spans in paragraphs:
        cur = 0
        frags = []
        for s, e in sorted(spans):
            frags.append(escape(text[cur:s]))
            frags.append('<rs type="astro-object">' + escape(text[s:e]) + "</rs>")
            cur = e
        frags.append(escape(text[cur:]))
        body.append("\t\t<p>" + "".join(frags) + "</p>")
    return (
        '<tei xmlns="http://www.tei-c.org/ns/1.0">\n'
        "\t<teiHeader>\n"
        f'\t\t<fileDesc xml:id="_{doc_id}"/>\n'
        "\t</teiHeader>\n"
        '\t<text xml:lang="en">\n' + "\n".join(body) + "\n\t</text>\n</tei>\n"
    )
