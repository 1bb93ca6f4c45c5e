"""Annotation-consistency lint over a TEI training corpus.

Functional counterpart of the reference's corpus checker
(/root/reference/scripts/consistency.py:72-160 — shipped non-functional:
unresolved merge-conflict markers and a Python 2/3 mix; the INTENT is
recoverable from the code). Its checks, re-expressed as one Spark plan
over the corpus instead of an egrep-per-surface-form loop:

1. ``too_short``        — annotated surface form of length 1
                          (consistency.py:128-130).
2. ``digits_short``     — all-digit form shorter than 4 chars
                          (consistency.py:131-133).
3. ``multi_type``       — one surface form annotated under >1 rs type
                          (consistency.py:106-116, 146-156).
4. ``unannotated_mention`` — a form annotated somewhere in the corpus but
                          appearing UN-annotated elsewhere (the "stinky"
                          egrep, consistency.py:134-143): occurrence
                          count across all paragraph texts exceeds the
                          annotation count.

Scale shape: annotations explode once and aggregate per form (the
annotation vocabulary of a training corpus is small — thousands, not
corpus-sized); occurrence counting is a broadcast nested-loop of that
small form table against the paragraphs with a JVM-side
substring-occurrence expression — the corpus is scanned ONCE total,
where the reference re-greps every file once per form (O(forms·corpus)).

CLI: python -m astrospark.ops.corpus_lint <tei_dir>
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARAGRAPH_SCHEMA = "doc_id string, para_idx int, text string, anns array<struct<start:int, end:int, rs_type:string>>"


def read_tei_corpus(spark: SparkSession, tei_dir: str) -> DataFrame:
    """One row per annotated paragraph from every .xml/.tei file in
    ``tei_dir`` (driver-side XML parse — training corpora are small; the
    10^12-row path is the extraction pipeline, not the training lint)."""
    import glob
    import os

    from astrospark.io.tei import tei_typed_annotations

    rows = []
    files = sorted(
        p
        for p in glob.glob(os.path.join(tei_dir, "*"))
        if p.endswith((".xml", ".tei"))
    )
    for path in files:
        with open(path, encoding="utf-8") as fh:
            xml_text = fh.read()
        for i, (text, spans) in enumerate(tei_typed_annotations(xml_text)):
            rows.append(
                (os.path.basename(path), i, text, [(s, e, t) for s, e, t in spans])
            )
    return spark.createDataFrame(rows, PARAGRAPH_SCHEMA)


def corpus_lint(corpus: DataFrame) -> DataFrame:
    """Findings DataFrame (form, finding, types, n_annotated,
    n_mentions, n_unannotated) — empty means the corpus is consistent."""
    ann = corpus.select(
        "doc_id",
        "text",
        F.explode("anns").alias("a"),
    ).select(
        F.expr("substring(text, a.start + 1, a.end - a.start)").alias("form"),
        F.col("a.rs_type").alias("rs_type"),
    ).filter(F.length("form") > 0)
    forms = ann.groupBy("form").agg(
        F.count("*").alias("n_annotated"),
        F.array_sort(F.collect_set("rs_type")).alias("types"),
    )

    # corpus-wide mention count per form: broadcast the (small) form
    # table against the paragraphs; occurrences = (len - len(remove(form))) / len(form)
    occ = (
        corpus.select("text")
        .crossJoin(F.broadcast(forms.select("form")))
        .select(
            "form",
            (
                (F.length("text") - F.length(F.replace(F.col("text"), F.col("form"))))
                / F.length("form")
            ).cast("long").alias("occ"),
        )
        .groupBy("form")
        .agg(F.sum("occ").alias("n_mentions"))
    )

    scored = forms.join(occ, "form").select(
        "form",
        "types",
        "n_annotated",
        "n_mentions",
        (F.col("n_mentions") - F.col("n_annotated")).alias("n_unannotated"),
    )
    findings = scored.select(
        "form",
        F.explode(
            F.concat(
                F.when(F.length("form") == 1, F.array(F.lit("too_short"))).otherwise(F.array()),
                F.when(
                    (F.length("form") < 4) & F.col("form").rlike("^[0-9]+$"),
                    F.array(F.lit("digits_short")),
                ).otherwise(F.array()),
                F.when(F.size("types") > 1, F.array(F.lit("multi_type"))).otherwise(F.array()),
                F.when(
                    F.col("n_unannotated") > 0, F.array(F.lit("unannotated_mention"))
                ).otherwise(F.array()),
            )
        ).alias("finding"),
        "types",
        "n_annotated",
        "n_mentions",
        "n_unannotated",
    )
    return findings.orderBy("form", "finding")


def main() -> None:
    if len(sys.argv) != 2:
        print("usage: python -m astrospark.ops.corpus_lint <tei_dir>")
        raise SystemExit(2)
    from astrospark.engine.session import build_session

    spark = build_session(app_name="corpus-lint", master="local[4]", shuffle_partitions=8)
    corpus = read_tei_corpus(spark, sys.argv[1])
    out = corpus_lint(corpus).collect()
    for r in out:
        print(
            f"{r['finding']:22s} {r['form']!r} types={list(r['types'])} "
            f"annotated={r['n_annotated']} mentions={r['n_mentions']}"
        )
    print(f"{len(out)} finding(s) over {corpus.count()} paragraphs")
    spark.stop()
    raise SystemExit(1 if out else 0)


if __name__ == "__main__":
    main()
