"""Golden tests against the reference's OWN test corpus.

- src/test/resources/text.txt: the reference's (disabled) unit test
  expects 5 extracted entities (AstroParserTest.java:76). Our engine
  extracts exactly 5 — the five GRB designations — with correct offsets.
- resources/dataset/astro/evaluation/sample.tei.xml: every annotated
  <rs type="astro-object"> span is reproduced exactly (text + offsets),
  with zero false positives.

Skipped when the reference checkout is unavailable (the engine itself
never depends on it).
"""

import os

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout unavailable"
)


def test_text_txt_golden_count_and_mentions(artifacts):
    from astrospark.oracle import process_text_chunk

    vocab, trie, model = artifacts
    text = open(f"{REF}/src/test/resources/text.txt", encoding="utf-8").read()
    ents = process_text_chunk(text, vocab, trie, model)
    assert [(e.raw_form, e.offset_start) for e in ents] == [
        ("GRB 050219", 0),
        ("GRB 020819B", 313),
        ("GRB 020819B", 475),
        ("GRB 030329", 564),
        ("GRB 980425", 653),
    ]
    assert len(ents) == 5  # AstroParserTest.java:76 golden


def test_sample_tei_exact_spans(artifacts):
    from astrospark.io.tei import tei_annotated_paragraphs
    from astrospark.oracle import process_text_chunk

    vocab, trie, model = artifacts
    xml = open(
        f"{REF}/resources/dataset/astro/evaluation/sample.tei.xml", encoding="utf-8"
    ).read()
    paras = tei_annotated_paragraphs(xml)
    assert len(paras) == 4
    total = 0
    for text, gold in paras:
        pred = [
            (e.offset_start, e.offset_end) for e in process_text_chunk(text, vocab, trie, model)
        ]
        assert pred == gold, (text[:60], pred, gold)
        total += len(gold)
    assert total == 8


def test_spark_pipeline_on_reference_corpus(spark, artifacts):
    """The cluster path reproduces the same goldens end-to-end."""
    from astrospark.engine.extraction import broadcast_artifacts, extract_spans
    from astrospark.io.tei import tei_chunks

    vocab, trie, model = artifacts
    text = open(f"{REF}/src/test/resources/text.txt", encoding="utf-8").read()
    xml = open(
        f"{REF}/resources/dataset/astro/evaluation/sample.tei.xml", encoding="utf-8"
    ).read()
    rows = [("text_txt", [("text", text, "", 0)])]
    off = 0
    spans = []
    for chunk in tei_chunks(xml):
        spans.append(("text", chunk, "", off))
        off += len(chunk) + 1
    rows.append(("sample_tei", spans))
    docs = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = extract_spans(docs, broadcast_artifacts(spark, artifacts)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.text)
    assert by_doc["text_txt"] == [
        "GRB 050219", "GRB 020819B", "GRB 020819B", "GRB 030329", "GRB 980425",
    ]
    assert sorted(by_doc["sample_tei"]) == sorted(
        ["ID C2718", "ID 13B-017", "GRBs 020819B", "050219", "080319C",
         "110918A", "GRB 020819B", "GRB 050219"]
    )
