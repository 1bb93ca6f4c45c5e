"""Regenerate the oracle-derived golden artifacts consumed by the driver
contract (run after ANY change to the fixture generator, gazetteer,
feature semantics, or the shipped weights artifact):

- tests/golden/interleaved_spans.parquet — the full expected span table
  of the `extract_interleaved` query (150 fixture docs, seed 42,
  skew_every 75), computed by the SCALAR ORACLE (not the kernel, so the
  golden is independent of the code under test).
- tests/golden/flagship_spans.parquet — same for the flagship query's
  fixture corpus (sf filler docs contribute zero spans).
- tests/golden/decoded_media.parquet — expected decode records of the
  `m_decode_stub` query (pure-Python decode of the seeded media table,
  no Spark in the loop).
- prints the per-kind counts to paste into the `extraction_kind_counts`
  oracle in __spark_entry__.py.
"""

from __future__ import annotations

import os
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from astrospark.crf import CrfModel
    from astrospark.fixtures import make_docs
    from astrospark.lexicon import load_artifacts
    from astrospark.oracle import process_document
    from astrospark.train import WEIGHTS_PATH

    vocab, trie = load_artifacts()
    model = CrfModel.load(WEIGHTS_PATH)

    def spans_table(docs):
        rows: dict = {k: [] for k in ("doc_id", "seq", "kind", "text", "media_ref", "offset")}
        counts: Counter = Counter()
        for d in docs:
            for s in process_document(d["spans"], vocab, trie, model):
                rows["doc_id"].append(d["doc_id"])
                for k in ("seq", "kind", "text", "media_ref", "offset"):
                    rows[k].append(s[k])
                counts[s["kind"]] += 1
        t = pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.string()),
                "seq": pa.array(rows["seq"], pa.int32()),
                "kind": pa.array(rows["kind"], pa.string()),
                "text": pa.array(rows["text"], pa.string()),
                "media_ref": pa.array(rows["media_ref"], pa.string()),
                "offset": pa.array(rows["offset"], pa.int32()),
            }
        )
        return t, counts

    os.makedirs(os.path.join(REPO, "tests", "golden"), exist_ok=True)
    for name, docs in (
        ("interleaved_spans", make_docs(150, seed=42, skew_every=75)),
        # flagship golden: the sf documents are filler with zero
        # extractions (verified for sf0.001/sf0.01), so the expected
        # output is exactly the 60-doc fixture corpus's spans
        ("flagship_spans", make_docs(60, seed=42, skew_every=0)),
    ):
        t, counts = spans_table(docs)
        out = os.path.join(REPO, "tests", "golden", f"{name}.parquet")
        pq.write_table(t, out)
        print(f"wrote {out}: {t.num_rows} rows; kind counts: {dict(counts)}")
    # decoded-media golden: replay the deterministic fixture payloads
    # through the pure-Python decode (same function the Spark kernel runs)
    import numpy as np

    from astrospark.ops.multimodal import _decode_one, make_fixture_payload

    rng = np.random.default_rng(13)
    recs: dict = {k: [] for k in ("media_ref", "media_type", "width", "height", "n_frames", "mean_luma")}
    for i in range(200):
        mt = ("image", "audio", "video")[int(rng.integers(0, 3))]
        w, h = int(rng.integers(16, 512)), int(rng.integers(16, 512))
        frames = 1 if mt == "image" else int(rng.integers(10, 300))
        payload = make_fixture_payload(mt, w, h, frames, 13 * 1000 + i)
        dw, dh, nf, luma = _decode_one(mt, payload)
        recs["media_ref"].append(f"{mt[:3]}://obj/{i:09d}")
        recs["media_type"].append(mt)
        recs["width"].append(dw)
        recs["height"].append(dh)
        recs["n_frames"].append(nf)
        recs["mean_luma"].append(round(luma, 4))
    tm = pa.table(
        {
            "media_ref": pa.array(recs["media_ref"], pa.string()),
            "media_type": pa.array(recs["media_type"], pa.string()),
            "width": pa.array(recs["width"], pa.int32()),
            "height": pa.array(recs["height"], pa.int32()),
            "n_frames": pa.array(recs["n_frames"], pa.int32()),
            "mean_luma": pa.array(recs["mean_luma"], pa.float64()),
        }
    )
    outm = os.path.join(REPO, "tests", "golden", "decoded_media.parquet")
    pq.write_table(tm, outm)
    print(f"wrote {outm}: {tm.num_rows} rows")
    print("(update the extraction_kind_counts oracle in __spark_entry__.py "
          "if the counts changed)")


if __name__ == "__main__":
    main()
