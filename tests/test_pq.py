"""Product-quantization tests: a full scalar (pure-Python integer)
replay of codebook training + encoding + ADC scoring pins the values
independently of both engines; plan guards pin the broadcast/TakeOrdered
shape that makes PQ the compressed scale path."""

import io
import math
from contextlib import redirect_stdout

SF = "/root/testdata/sf0.001"


def _scalar_pq(vecs):
    """Replay pq_codebooks/pq_codes/ann_pq_topk semantics in plain
    Python: floor-quantize, per-subspace Lloyd with integer squared-L2
    + code-asc tie-break, floor(avg) updates, ADC table scoring."""
    from astrospark.ops.similarity import (
        PQ_ITERS,
        PQ_K,
        PQ_M,
        QUANT_SCALE,
        TOP_K,
    )

    dim = len(next(iter(vecs.values())))
    sub = dim // PQ_M
    q = {
        vid: [math.floor(float(x) * QUANT_SCALE) for x in v]
        for vid, v in vecs.items()
    }
    sv = {
        (vid, m): qv[m * sub : (m + 1) * sub]
        for vid, qv in q.items()
        for m in range(PQ_M)
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    cb = {(m, c): sv[(c, m)] for c in range(1, PQ_K + 1) for m in range(PQ_M)}
    for _ in range(PQ_ITERS):
        members = {}
        for (vid, m), s in sv.items():
            best = min(
                (d2(s, cb[(m, c)]), c) for c in range(1, PQ_K + 1)
            )
            members.setdefault((m, best[1]), []).append(s)
        for key, ms in members.items():
            n = len(ms)
            cb[key] = [
                math.floor(sum(s[i] for s in ms) / n) for i in range(sub)
            ]
    codes = {
        (vid, m): min((d2(s, cb[(m, c)]), c) for c in range(1, PQ_K + 1))[1]
        for (vid, m), s in sv.items()
    }
    table = {
        (m, c): d2(sv[(0, m)], cb[(m, c)])
        for m in range(PQ_M)
        for c in range(1, PQ_K + 1)
    }
    adist = {
        vid: sum(table[(m, codes[(vid, m)])] for m in range(PQ_M))
        for vid in vecs
        if vid != 0
    }
    topk = sorted(adist.items(), key=lambda kv: (kv[1], kv[0]))[:TOP_K]
    return codes, topk


def _load_vecs(spark):
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    return {r.vec_id: r.embedding for r in rows}


def test_pq_codes_scalar_replay(spark):
    from astrospark.ops.similarity import PQ_K, PQ_M, pq_codes

    expected_codes, _ = _scalar_pq(_load_vecs(spark))
    got = {(r.vec_id, r.m): r.code for r in pq_codes(spark, SF).collect()}
    assert got == expected_codes
    assert all(1 <= c <= PQ_K for c in got.values())
    # exactly PQ_M codes per vector — the compressed representation
    per_vec = {}
    for vid, m in got:
        per_vec[vid] = per_vec.get(vid, 0) + 1
    assert set(per_vec.values()) == {PQ_M}


def test_ann_pq_topk_scalar_replay(spark):
    from astrospark.ops.similarity import ann_pq_topk

    _, expected_topk = _scalar_pq(_load_vecs(spark))
    got = [(r.vec_id, r.adist) for r in ann_pq_topk(spark, SF).collect()]
    assert got == expected_topk


def test_pq_plan_shape(spark):
    """Codebooks and the ADC table ride broadcasts; the final ranking is
    a TakeOrdered, and nothing degenerates into a cross product."""
    from astrospark.ops.similarity import ann_pq_topk

    buf = io.StringIO()
    with redirect_stdout(buf):
        ann_pq_topk(spark, SF).explain(mode="formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrdered" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivfadc_is_adc_restricted_to_probed_cell(spark):
    """IVFADC == the scalar ADC ranking restricted to the query's
    coarse cell: candidates never leave the probed cell, and within it
    the order is exactly the PQ approximate distance."""
    from astrospark.ops.similarity import TOP_K, ann_ivfadc_topk, kmeans_cells

    codes, _ = _scalar_pq(_load_vecs(spark))
    # scalar ADC distances for every vector (recompute via _scalar_pq's
    # internals is overkill — derive from the full top-k over the cell)
    cells = {
        r.vec_id: r.cell
        for r in kmeans_cells(spark, SF).filter("rnk = 1").collect()
    }
    q_cell = cells[0]

    from astrospark.ops.similarity import ann_pq_topk

    got = [(r.vec_id, r.adist) for r in ann_ivfadc_topk(spark, SF).collect()]
    assert len(got) <= TOP_K
    assert all(cells[vid] == q_cell for vid, _ in got)
    # ranking agrees with the unrestricted ADC scorer wherever both rank:
    # any cell-mate the full ADC top-k ranks must appear in IVFADC's list
    # no later than its full-ADC position
    full = [(r.vec_id, r.adist) for r in ann_pq_topk(spark, SF).collect()]
    full_cellmates = [(v, d) for v, d in full if cells[v] == q_cell]
    assert got[: len(full_cellmates)] == full_cellmates
    # distances ascend with vec_id tie-break
    assert got == sorted(got, key=lambda t: (t[1], t[0]))
