"""TEI source/sink, text-dir source, CRF feature sink, API façade."""

import pytest

from astrospark.io import tei
from astrospark.io.textdir import paragraphs_of_text, read_text_dir, write_crf_features

SAMPLE_TEI = """<tei xmlns="http://www.tei-c.org/ns/1.0">
  <teiHeader><fileDesc xml:id="_1"/></teiHeader>
  <text xml:lang="en">
    <p>Based on observations collected with ATCA under <rs type="astro-object">ID C2718</rs>,
       and at VLA under <rs type="astro-object">ID 13B-017</rs>.</p>
    <p>We detect only <rs type="astro-object">GRB 020819B</rs> with a measured flux.</p>
    <p>   </p>
  </text>
</tei>"""


def test_tei_chunks_normalize_whitespace():
    chunks = tei.tei_chunks(SAMPLE_TEI)
    assert len(chunks) == 2
    assert chunks[0].startswith("Based on observations collected with ATCA under ID C2718,")
    assert "\n" not in chunks[0] and "  " not in chunks[0]


def test_tei_annotated_paragraphs_offsets():
    paras = tei.tei_annotated_paragraphs(SAMPLE_TEI)
    assert len(paras) == 2
    text, spans = paras[0]
    assert [text[s:e] for s, e in spans] == ["ID C2718", "ID 13B-017"]
    text, spans = paras[1]
    assert [text[s:e] for s, e in spans] == ["GRB 020819B"]


def test_training_label_filters():
    text = "see (NGC 1275) and GRB 020819B;, end M 31 ."
    spans = [(4, 14), (19, 31), (37, 43)]
    # span 2 ends with ';' (31 exclusive covers 'GRB 020819B;'? adjust):
    spans = [(4, 14), (19, 31), (37, 44)]
    out = tei.apply_training_label_filters(text, spans)
    # '('-initial dropped; trailing '.'/';' + preceding space stripped
    assert (4, 14) not in out
    assert all(text[e - 1] not in ";., " for _s, e in out)


def test_training_tei_roundtrip():
    paras = tei.tei_annotated_paragraphs(SAMPLE_TEI)
    rendered = tei.training_tei(paras)
    back = tei.tei_annotated_paragraphs(rendered)
    assert [(t, s) for t, s in back] == paras


def test_paragraphs_of_text():
    text = "line one\nline two\n\n\npara two\n"
    assert paragraphs_of_text(text) == ["line one\nline two\n", "para two\n"]


def test_read_text_dir_and_engine(spark, artifacts, tmp_path):
    (tmp_path / "a.txt").write_text("We detect GRB 020819B here.\n\nAnd NGC 1275 there.\n")
    (tmp_path / "b.txt").write_text("no entities in this file\n")
    docs = read_text_dir(spark, str(tmp_path))
    rows = {r.doc_id: r.spans for r in docs.collect()}
    assert set(rows) == {"a", "b"}
    assert len(rows["a"]) == 2

    from astrospark.api import AstroEngine

    eng = AstroEngine(spark, artifacts)
    spans = eng.process_text_dir(str(tmp_path)).collect()
    texts = {r.text for r in spans}
    assert "GRB 020819B" in texts and "NGC 1275" in texts


def test_api_process_text(spark, artifacts):
    from astrospark.api import AstroEngine

    eng = AstroEngine(spark, artifacts)
    out = eng.process_text("We detect GRB 020819B at 3 GHz near NGC 1275.")
    assert [o["text"] for o in out] == ["GRB 020819B", "NGC 1275"]
    assert out[0]["offset"] == 10
    assert eng.process_text("   ") == []


def test_crf_feature_sink(tmp_path, artifacts):
    vocab, trie, _ = artifacts
    n = write_crf_features(
        ["We detect GRB 020819B.", "And NGC 1275."], str(tmp_path / "f.crf"), vocab, trie
    )
    assert n == 2
    content = (tmp_path / "f.crf").read_text().rstrip("\n").split("\n")
    # blank line separates sequences; each feature line has 18 columns
    assert "" in content
    first = content[0].split(" ")
    assert len(first) == 18
    assert first[0] == "We"

def test_jsonl_docs_roundtrip(spark, tmp_path):
    """S1 alternate format: interleaved docs survive a JSONL round-trip
    with the explicit schema (no inference pass) and extract identically
    to the parquet path."""
    import os

    from astrospark.fixtures import docs_dataframe
    from astrospark.io.sources import read_docs, write_docs_jsonl

    docs = docs_dataframe(spark, 20, seed=5, skew_every=10, n_partitions=2)
    path = os.fspath(tmp_path / "docs_jsonl")
    write_docs_jsonl(docs, path)
    back = read_docs(spark, path, fmt="jsonl")
    assert back.schema == docs.schema
    a = sorted(map(tuple, docs.select("doc_id", "spans").collect()))
    b = sorted(map(tuple, back.select("doc_id", "spans").collect()))
    assert a == b
