"""Linear-chain CRF scorer/decoder (pure numpy) + deterministic training.

Replaces the reference's Wapiti JNI hop
(/root/reference/src/main/java/org/grobid/core/engines/AstroParser.java:122,303,344
calling grobid-core ``label()`` → native Wapiti) with broadcastable numpy
weight tables and a batched Viterbi that decodes every sequence of an Arrow
batch in a handful of numpy ops per time-step — no per-token Python on the
Spark path.

Model shape: for each feature template k (templates.py), a value→row-id dict
and a dense (n_values+1, 3) weight matrix (last row = OOV/unseen → 0), plus a
3×3 label-transition matrix (the template file's ``B`` line). Score of a
label sequence y is sum_t emit[t, y_t] + sum_{t>0} T[y_{t-1}, y_t].

The shipped weights artifact (resources/weights.npz) is trained here with a
seeded averaged structured perceptron on the synthetic annotated corpus
(corpus.py) — the reference's own binary model is absent from its repo
(/root/reference/.MISSING_LARGE_BLOBS), so the model artifact is ours by
construction; reference parity is at the semantics level (features, decoding,
extraction), verified span-for-span against the scalar oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from astrospark.templates import BOUNDARY, EVAL_PLAN, N_LABELS, TEMPLATES

# ---------------------------------------------------------------------------
# template value construction (vectorized)
# ---------------------------------------------------------------------------


def shift_within_sequences(col: np.ndarray, seq_ids: np.ndarray, d: int) -> np.ndarray:
    """Value of ``col`` at position t+d, or BOUNDARY when t+d leaves the
    sequence. ``seq_ids`` must be grouped (all positions of a sequence
    contiguous). Fully vectorized."""
    n = len(col)
    if d == 0:
        return col
    out = np.full(n, BOUNDARY, dtype=object)
    if d > 0:
        if n > d:
            ok = seq_ids[d:] == seq_ids[:-d]
            out[: n - d][ok] = col[d:][ok]
    else:
        k = -d
        if n > k:
            ok = seq_ids[k:] == seq_ids[:-k]
            out[k:][ok] = col[: n - k][ok]
    return out


# separator for compound-template observation values; \x1f cannot appear in
# tokens (it is not producible by the tokenizer's delimiters/runs ambiguity-free
# join matters: '/' IS a valid single-char token)
SEP = "\x1f"


def template_values(cols: list[np.ndarray], seq_ids: np.ndarray) -> list[np.ndarray]:
    """For each template, the (possibly compound) observation string per
    position. Compound values are joined with SEP. (Training/oracle path —
    inference uses the factorized fast path in CrfModel.emissions.)"""
    values: list[np.ndarray] = []
    cols = [
        c if isinstance(c, np.ndarray) else np.asarray(c, dtype=object) for c in cols
    ]
    for _name, spec in TEMPLATES:
        parts = [shift_within_sequences(cols[c], seq_ids, d) for d, c in spec]
        if len(parts) == 1:
            values.append(parts[0])
        else:
            s = pd.Series(parts[0], dtype="object")
            joined = s.str.cat([pd.Series(p, dtype="object") for p in parts[1:]], sep=SEP)
            values.append(joined.to_numpy())
    return values


def shift_codes(codes: np.ndarray, seq_ids: np.ndarray, d: int) -> np.ndarray:
    """Factorized-code variant of shift_within_sequences; -1 = boundary."""
    n = len(codes)
    if d == 0:
        return codes
    out = np.full(n, -1, dtype=np.int64)
    if d > 0:
        if n > d:
            ok = seq_ids[d:] == seq_ids[:-d]
            out[: n - d][ok] = codes[d:][ok]
    else:
        k = -d
        if n > k:
            ok = seq_ids[k:] == seq_ids[:-k]
            out[k:][ok] = codes[: n - k][ok]
    return out


# ---------------------------------------------------------------------------
# model container
# ---------------------------------------------------------------------------


class CrfModel:
    __slots__ = ("vocabs", "weights", "trans", "_indexes", "_ctab")

    def __init__(self, vocabs: list[dict], weights: list[np.ndarray], trans: np.ndarray):
        self.vocabs = vocabs
        self.weights = weights
        self.trans = trans
        self._indexes: list[pd.Index] | None = None
        self._ctab = None

    def _vocab_index(self, k: int) -> pd.Index:
        """Hash index over template k's observation vocabulary; position ==
        weight row id (vocab dicts are insertion-ordered by id). Built once
        per model — get_indexer then probes in C instead of dict.get per
        value."""
        if self._indexes is None:
            self._indexes = [
                pd.Index(np.fromiter(v.keys(), dtype=object, count=len(v)))
                if v
                else pd.Index(np.empty(0, dtype=object))
                for v in self.vocabs
            ]
        return self._indexes[k]

    def _compound_tables(self):
        """Integer-key probe tables for the compound templates, built once
        per model. Every compound vocab key is split on SEP into its
        component observation strings (exactly len(spec) parts — verified;
        any undecomposable key disables the tables and the scorer keeps the
        string path). Components get dense ids from one shared index, and
        each vocab key becomes a mixed-radix int64 (base B = #components+1,
        leaving digit B-1 free as the not-in-any-vocab sentinel for batch
        tokens never seen in training). A batch combo then matches a vocab
        row iff its component ids match digit-for-digit — equivalent to the
        string join+probe whenever batch components are SEP-free, which the
        scorer checks per batch (see emissions).
        """
        if self._ctab is None:
            comps: set[str] = {BOUNDARY}
            split: dict[int, list[list[str]]] = {}
            ok = True
            for k, (_name, spec) in enumerate(TEMPLATES):
                p = len(spec)
                if p <= 1:
                    continue
                rows = []
                for key in self.vocabs[k]:
                    parts = key.split(SEP)
                    if len(parts) != p:
                        ok = False
                        break
                    rows.append(parts)
                if not ok:
                    break
                split[k] = rows
                for parts in rows:
                    comps.update(parts)
            if ok:
                comp_index = pd.Index(np.array(sorted(comps), dtype=object))
                B = len(comp_index) + 1
                max_p = max((len(TEMPLATES[k][1]) for k in split), default=1)
                # mixed-radix keys must fit int64
                ok = B**max_p < 2**62
            if ok:
                boundary_cid = int(comp_index.get_loc(BOUNDARY))
                key_idx: dict[int, pd.Index] = {}
                for k, rows in split.items():
                    if rows:
                        p = len(rows[0])
                        cids = (
                            comp_index.get_indexer(
                                np.array(rows, dtype=object).ravel()
                            )
                            .reshape(len(rows), p)
                            .astype(np.int64)
                        )
                        keys = np.zeros(len(rows), dtype=np.int64)
                        for j in range(p):
                            keys = keys * B + cids[:, j]
                        key_idx[k] = pd.Index(keys)
                    else:
                        key_idx[k] = pd.Index(np.empty(0, dtype=np.int64))
                self._ctab = (comp_index, B, boundary_cid, key_idx)
            else:
                self._ctab = False
        return self._ctab or None

    def save(self, path: str) -> None:
        arrays: dict[str, np.ndarray] = {"trans": self.trans}
        for k, (vocab, w) in enumerate(zip(self.vocabs, self.weights)):
            vals = np.empty(len(vocab), dtype=object)
            for v, i in vocab.items():
                vals[i] = v
            arrays[f"vals_{k}"] = vals.astype("U")
            arrays[f"w_{k}"] = w.astype(np.float32)
        np.savez_compressed(path, **arrays)

    @classmethod
    def load(cls, path: str) -> "CrfModel":
        data = np.load(path, allow_pickle=False)
        vocabs, weights = [], []
        for k in range(len(TEMPLATES)):
            vals = data[f"vals_{k}"]
            vocabs.append({str(v): i for i, v in enumerate(vals)})
            weights.append(data[f"w_{k}"].astype(np.float32))
        return cls(vocabs, weights, data["trans"].astype(np.float32))

    # -- scoring ------------------------------------------------------------

    def emissions(self, cols: list, seq_ids: np.ndarray) -> np.ndarray:
        """(n, L) emission scores for a batch of concatenated sequences.

        Fast path: each base column is factorized ONCE per batch; per
        template the vocab lookup runs over the column's UNIQUE values
        (a lookup table), then a single gather applies it to all n
        positions — dict work is O(#unique) instead of O(n·#templates).

        A ``cols`` entry may also be a tuple ``(per_unique_vals,
        full_codes)`` — the kernel's unique-token path: the column's value
        at position t is ``per_unique_vals[full_codes[t]]``. Factorization
        then runs over the per-unique values (thousands) and reaches full
        length with one int gather, never materializing n strings.

        Evaluation follows ``templates.EVAL_PLAN``: single-col templates
        over token-derived columns are grouped by offset, and when every
        such column arrives as a tuple sharing ONE ``full_codes`` array
        (the kernel's unique-token path), each group pre-sums its members'
        per-distinct-token weight tables (float64, ascending template
        order) and expands the sum with a SINGLE length-n gather — one
        big-n take+add per offset instead of one per template (~5x less
        memory traffic; L is only 3, so the whole pass is bandwidth-bound).
        The scalar oracle accumulates in the identical plan order, keeping
        kernel ≡ oracle bit-exact (see EVAL_PLAN's docstring).
        """
        n = len(seq_ids)
        # float64 accumulation — matches the scalar oracle (and Wapiti's C
        # doubles); float32 sums drift enough over 50+ templates and long
        # Viterbi chains to flip near-tie decodes on multi-thousand-token
        # sequences (caught by giant-doc fuzz)
        scores = np.zeros((n, N_LABELS), dtype=np.float64)
        codes: dict[int, np.ndarray] = {}
        uniques: dict[int, np.ndarray] = {}

        def col_codes(c: int) -> np.ndarray:
            if c not in codes:
                if isinstance(cols[c], tuple):
                    uvals, full_codes = cols[c]
                    cd, un = pd.factorize(pd.Series(uvals))
                    codes[c] = cd.astype(np.int64)[full_codes]
                else:
                    cd, un = pd.factorize(cols[c])
                    codes[c] = cd.astype(np.int64)
                uniques[c] = np.asarray(un, dtype=object)
            return codes[c]

        shifted: dict[tuple[int, int], np.ndarray] = {}

        def get_shifted(d: int, c: int) -> np.ndarray:
            key = (d, c)
            if key not in shifted:
                shifted[key] = shift_codes(col_codes(c), seq_ids, d)
            return shifted[key]

        ccodes: dict[int, np.ndarray | None] = {}
        # canonical consecutive-run compound caches (see the compound
        # branch): boundary-padded per-position component codes per column,
        # and one factorized adjacent p-gram key array per (column, p)
        canon_ext: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        canon_gram: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}

        def col_ccodes(c: int, ctab) -> np.ndarray | None:
            """Column c's per-unique component ids for the compound
            integer-key path (boundary id appended so shifted code -1
            gathers it), or None when a batch value contains SEP — the
            one case where string-join equality and componentwise
            equality can diverge."""
            if c not in ccodes:
                col_codes(c)  # materialize uniques[c]
                u = uniques[c]
                comp_index, _B, boundary_cid, _ki = ctab
                if len(u) and (
                    pd.Series(u, dtype=object)
                    .str.contains(SEP, regex=False)
                    .to_numpy(dtype=bool)
                    .any()
                ):
                    ccodes[c] = None
                else:
                    cid = comp_index.get_indexer(u).astype(np.int64)
                    cid[cid < 0] = len(comp_index)  # unseen-token sentinel
                    ccodes[c] = np.append(cid, np.int64(boundary_cid))
            return ccodes[c]

        # one reusable (n, L) float32 gather buffer for per-template takes
        # — per-template temp allocations (6+ MB each) were ~45% of the
        # single-template path (malloc + page faults), and np.take(out=)
        # + in-place += is bit-identical to the allocating form (same
        # values, same float64 accumulation order)
        tmp = np.empty((n, N_LABELS), dtype=np.float32)

        def single_into(k: int, d: int, c: int) -> None:
            """Gather template k's weight rows for all n positions → tmp."""
            vocab = self.vocabs[k]
            w = self.weights[k]
            oov = len(vocab)
            sc = get_shifted(d, c)
            lut = self._vocab_index(k).get_indexer(uniques[c])
            lut[lut < 0] = oov
            lut = np.append(lut, vocab.get(BOUNDARY, oov))  # code -1
            # gather weights into a per-batch small table first: the
            # big-n gather then hits a cache-resident (u+1, L) array
            # (negative boundary codes index the appended last row —
            # np.take supports them exactly like fancy indexing)
            np.take(w[lut], sc, axis=0, out=tmp)

        # shared-unique grouped path: every grouped column is a tuple over
        # the SAME full_codes array (identity check — the kernel builds all
        # 17 from one el_codes), so all members of an offset group share
        # one shifted index and their tables can be pre-summed
        group_cols = sorted(
            {c for item in EVAL_PLAN if item[0] == "group" for _k, c in item[2]}
        )
        fast = bool(group_cols) and all(
            isinstance(cols[c], tuple) for c in group_cols
        )
        if fast:
            base_codes = cols[group_cols[0]][1]
            fast = all(cols[c][1] is base_codes for c in group_cols[1:])
        if fast:
            n_uniq = len(cols[group_cols[0]][0])
            base_codes = np.asarray(base_codes, dtype=np.int64)
            tmp64 = np.empty((n, N_LABELS), dtype=np.float64)
            ucodes: dict[int, tuple[np.ndarray, np.ndarray]] = {}

            def col_ucodes(c: int) -> tuple[np.ndarray, np.ndarray]:
                # factorize the PER-UNIQUE column values (dedupes shapes/
                # prefixes shared across distinct tokens) so each template's
                # vocab probe runs over the smaller value set
                if c not in ucodes:
                    cd, un = pd.factorize(pd.Series(cols[c][0]))
                    ucodes[c] = (cd.astype(np.int64), np.asarray(un, dtype=object))
                return ucodes[c]

            shifted_uid: dict[int, np.ndarray] = {}

            def get_shifted_uid(d: int) -> np.ndarray:
                if d not in shifted_uid:
                    shifted_uid[d] = shift_codes(base_codes, seq_ids, d)
                return shifted_uid[d]

        for item in EVAL_PLAN:
            if item[0] == "group":
                d, members = item[1], item[2]
                if fast:
                    # per-distinct-token pre-sum: G[u] = sum over member
                    # templates of their weight row for token u (float64,
                    # ascending k); last row = the members' summed boundary
                    # rows (all members share offset d, so positions are
                    # jointly in-bounds or jointly boundary)
                    grp = np.zeros((n_uniq + 1, N_LABELS), dtype=np.float64)
                    for k, c in members:
                        vocab = self.vocabs[k]
                        w = self.weights[k]
                        oov = len(vocab)
                        cd, un = col_ucodes(c)
                        lut = self._vocab_index(k).get_indexer(un)
                        lut[lut < 0] = oov
                        grp[:n_uniq] += w[lut[cd]]
                        grp[n_uniq] += w[vocab.get(BOUNDARY, oov)]
                    np.take(grp, get_shifted_uid(d), axis=0, out=tmp64)
                    scores += tmp64
                elif len(members) == 1:
                    # no pre-sum to share — identical to the single path
                    (k, c) = members[0]
                    single_into(k, d, c)
                    scores += tmp
                else:
                    part = np.zeros((n, N_LABELS), dtype=np.float64)
                    for k, c in members:
                        single_into(k, d, c)
                        part += tmp
                    scores += part
                continue
            if item[0] == "single":
                _tag, k, d, c = item
                single_into(k, d, c)
                scores += tmp
                continue
            # compound templates
            k = item[1]
            _name, spec = TEMPLATES[k]
            vocab = self.vocabs[k]
            w = self.weights[k]
            oov = len(vocab)
            # integer-key fast path: probe the vocab with mixed-radix
            # component-id keys instead of building join strings for every
            # unique combo. Exact iff batch components are SEP-free (then
            # string-join equality == componentwise equality); a SEP-bearing
            # batch column falls back to the string path below.
            ctab = self._compound_tables()
            if ctab is not None:
                # canonical consecutive-run sub-path: every shipped compound
                # template is an adjacent p-gram of ONE column at some start
                # offset d0 (bigrams at d0 ∈ {-2,-1,0,1}, trigrams at
                # {-2,0}), so all of them are reads of ONE canonical
                # adjacent-p-gram array at shifted positions. Build the
                # column's component codes once with TWO boundary sentinels
                # padded on each side of every sequence (offsets reach ±2,
                # and pads of adjacent sequences compose to the correct
                # all-boundary combos), form p-gram mixed-radix keys over
                # the padded array, and factorize ONCE per (column, p) —
                # replacing one full-length factorize PER TEMPLATE with one
                # per gram order. Key values are identical digit-for-digit
                # to the per-template combine (same ascending-offset radix
                # order, same boundary id for out-of-range and NaN-coded
                # positions), so the probed weight rows are bit-identical.
                offs = [d for d, _c in spec]
                cset = {c for _d, c in spec}
                run_ok = len(cset) == 1 and offs == list(
                    range(offs[0], offs[0] + len(spec))
                )
                cid_run = col_ccodes(next(iter(cset)), ctab) if run_ok else None
                if cid_run is not None:
                    c0, p, d0 = next(iter(cset)), len(spec), offs[0]
                    _ci, B, bcid, key_idx = ctab
                    if c0 not in canon_ext:
                        change = np.empty(n, dtype=bool)
                        change[0] = True
                        change[1:] = seq_ids[1:] != seq_ids[:-1]
                        rank = np.cumsum(change) - 1
                        ext_pos = np.arange(n, dtype=np.int64) + 2 + 4 * rank
                        m_ext = n + 4 * int(rank[-1] + 1)
                        pext = np.full(m_ext, bcid, dtype=np.int64)
                        pext[ext_pos] = cid_run[col_codes(c0)]
                        canon_ext[c0] = (pext, ext_pos)
                    pext, ext_pos = canon_ext[c0]
                    if (c0, p) not in canon_gram:
                        hi = len(pext) - p + 1
                        comb = pext[:hi].copy()
                        for j in range(1, p):
                            comb *= B
                            comb += pext[j : hi + j]
                        inv, uk = pd.factorize(comb)
                        canon_gram[(c0, p)] = (
                            inv.astype(np.int64),
                            np.asarray(uk, dtype=np.int64),
                        )
                    inv, uk = canon_gram[(c0, p)]
                    row = key_idx[k].get_indexer(uk).astype(np.int64)
                    row[row < 0] = oov
                    np.take(w[row], inv[ext_pos + d0], axis=0, out=tmp)
                    scores += tmp
                    continue
                cc = [col_ccodes(c, ctab) for _d, c in spec]
                if all(x is not None for x in cc):
                    comp_index, B, _bcid, key_idx = ctab
                    comb = None
                    for (d, c), cid_ext in zip(spec, cc):
                        sc = get_shifted(d, c)
                        pcode = cid_ext[sc]  # -1 hits the appended boundary id
                        comb = pcode if comb is None else comb * B + pcode
                    inv, ucomb = pd.factorize(comb)
                    row = key_idx[k].get_indexer(np.asarray(ucomb, dtype=np.int64))
                    row[row < 0] = oov
                    np.take(w[row], inv, axis=0, out=tmp)
                    scores += tmp
                    continue
            # string path (fallback): combine component codes into one
            # integer key, dedupe, and build observation strings only for
            # the unique combos
            comb = None
            bases = []
            for d, c in spec:
                sc = get_shifted(d, c)
                b = len(uniques[c]) + 1
                bases.append(b)
                comb = (sc + 1) if comb is None else comb * b + (sc + 1)
            # hash-based factorize beats sort-based np.unique here and
            # uniqueness order is irrelevant (gather by inv either way)
            inv, ucomb = pd.factorize(comb)
            ucomb = np.asarray(ucomb, dtype=comb.dtype)
            comps = []
            rem = ucomb.copy()
            for (d, c), b in zip(reversed(spec), reversed(bases)):
                comps.append((rem % b - 1, c))
                rem //= b
            comps.reverse()
            svals = None
            for comp, c in comps:
                u = uniques[c]
                part = np.where(comp >= 0, u[np.clip(comp, 0, None)], BOUNDARY)
                part = part.astype(object)
                svals = part if svals is None else svals + SEP + part
            lut = self._vocab_index(k).get_indexer(svals)
            lut[lut < 0] = oov
            np.take(w[lut], inv, axis=0, out=tmp)  # same buffer reuse
            scores += tmp
        return scores


# ---------------------------------------------------------------------------
# Viterbi — batched over many sequences at once
# ---------------------------------------------------------------------------


def viterbi_single(emit: np.ndarray, trans: np.ndarray) -> np.ndarray:
    """Scalar-path Viterbi for one sequence (used by training + oracle)."""
    T = emit.shape[0]
    if T == 0:
        return np.empty(0, dtype=np.int64)
    delta = emit[0].astype(np.float64).copy()
    psi = np.zeros((T, N_LABELS), dtype=np.int64)
    for t in range(1, T):
        cand = delta[:, None] + trans
        psi[t] = np.argmax(cand, axis=0)
        delta = cand[psi[t], np.arange(N_LABELS)] + emit[t]
    labels = np.empty(T, dtype=np.int64)
    labels[-1] = int(np.argmax(delta))
    for t in range(T - 1, 0, -1):
        labels[t - 1] = psi[t, labels[t]]
    return labels


def viterbi_batched(emit: np.ndarray, seq_ids: np.ndarray, trans: np.ndarray,
                    bucket_size: int = 512) -> np.ndarray:
    """Decode all sequences in a concatenated batch.

    Sequences are bucketed by length (after sorting) so padding waste stays
    bounded even with heavy document-length skew; within a bucket the DP runs
    as (S, L) numpy ops per time-step — python loops scale with max sequence
    length, not token count.
    """
    n = len(seq_ids)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # sequence boundaries (seq_ids grouped)
    change = np.flatnonzero(np.diff(seq_ids)) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    lengths = ends - starts
    order = np.argsort(lengths, kind="stable")

    out = np.empty(n, dtype=np.int64)
    transT = trans.astype(np.float64)  # f64 accumulation, same as viterbi_single

    for b0 in range(0, len(order), bucket_size):
        idx = order[b0 : b0 + bucket_size]
        ls = lengths[idx]
        S = len(idx)
        Tmax = int(ls.max())
        # gather into (S, Tmax, L) padded tensor
        em = np.zeros((S, Tmax, N_LABELS), dtype=np.float64)
        for si, qi in enumerate(idx):
            em[si, : lengths[qi]] = emit[starts[qi] : ends[qi]]
        delta = em[:, 0, :].copy()  # (S, L)
        psi = np.zeros((S, Tmax, N_LABELS), dtype=np.int8)
        active_len = ls
        if N_LABELS == 3:
            # unrolled 3-label max: the same cand[s,i,j] = delta[s,i] +
            # trans[i,j] scalars, with argmax's first-max tie-break
            # reproduced by strict > comparisons (lower prev index wins
            # ties) — bit-identical to the generic path below
            t0c, t1c, t2c = transT[0], transT[1], transT[2]
            for t in range(1, Tmax):
                v0 = delta[:, 0:1] + t0c
                v1 = delta[:, 1:2] + t1c
                v2 = delta[:, 2:3] + t2c
                p01 = v1 > v0
                m01 = np.where(p01, v1, v0)
                best_prev = np.where(v2 > m01, 2, p01)
                best_score = np.maximum(m01, v2)
                new_delta = best_score + em[:, t, :]
                alive = (active_len > t)[:, None]
                delta = np.where(alive, new_delta, delta)
                psi[:, t, :] = best_prev
        else:
            for t in range(1, Tmax):
                cand = delta[:, :, None] + transT[None, :, :]  # (S, L, L)
                best_prev = cand.argmax(axis=1)  # (S, L)
                best_score = np.take_along_axis(cand, best_prev[:, None, :], axis=1)[:, 0, :]
                new_delta = best_score + em[:, t, :]
                alive = (active_len > t)[:, None]
                delta = np.where(alive, new_delta, delta)
                psi[:, t, :] = best_prev
        last = delta.argmax(axis=1)  # (S,)
        # backtrack (vectorized across the bucket)
        labels_pad = np.zeros((S, Tmax), dtype=np.int64)
        cur = last
        t_idx = ls - 1
        labels_pad[np.arange(S), t_idx] = cur
        for t in range(Tmax - 1, 0, -1):
            active = t_idx >= t
            prev = psi[np.arange(S), t, cur]
            cur = np.where(active, prev, cur)
            pos = t - 1
            write = active
            labels_pad[np.arange(S)[write], pos] = cur[write]
        for si, qi in enumerate(idx):
            out[starts[qi] : ends[qi]] = labels_pad[si, : lengths[qi]]
    return out


# ---------------------------------------------------------------------------
# training — averaged structured perceptron (deterministic)
# ---------------------------------------------------------------------------


def build_vocabs(all_values: list[list[np.ndarray]]) -> list[dict]:
    """Observation vocabularies per template from training sequences."""
    vocabs: list[dict] = []
    for k in range(len(TEMPLATES)):
        vocab: dict = {}
        for values in all_values:
            for v in values[k]:
                if v not in vocab:
                    vocab[v] = len(vocab)
        vocabs.append(vocab)
    return vocabs


def train_perceptron(
    sequences: list[tuple[list[np.ndarray], np.ndarray]],
    n_iter: int = 8,
    seed: int = 42,
) -> CrfModel:
    """``sequences``: per sequence, (feature columns list, gold label array).

    Averaged structured perceptron with Viterbi decoding; deterministic
    shuffling with the given seed.
    """
    per_seq_values: list[list[np.ndarray]] = []
    golds: list[np.ndarray] = []
    for cols, gold in sequences:
        sid = np.zeros(len(gold), dtype=np.int64)
        per_seq_values.append(template_values(cols, sid))
        golds.append(np.asarray(gold, dtype=np.int64))

    vocabs = build_vocabs(per_seq_values)
    # pre-map values to ids (OOV row never used in training)
    per_seq_ids = [
        [np.array([vocabs[k][v] for v in vals[k]], dtype=np.int64) for k in range(len(TEMPLATES))]
        for vals in per_seq_values
    ]

    weights = [np.zeros((len(v) + 1, N_LABELS), dtype=np.float64) for v in vocabs]
    acc = [np.zeros_like(w) for w in weights]
    trans = np.zeros((N_LABELS, N_LABELS), dtype=np.float64)
    trans_acc = np.zeros_like(trans)
    c = 1

    rng = np.random.default_rng(seed)
    order = np.arange(len(sequences))
    for _epoch in range(n_iter):
        rng.shuffle(order)
        for qi in order:
            ids_k = per_seq_ids[qi]
            gold = golds[qi]
            T = len(gold)
            emit = np.zeros((T, N_LABELS), dtype=np.float64)
            for k in range(len(TEMPLATES)):
                emit += weights[k][ids_k[k]]
            pred = viterbi_single(emit, trans)
            if not np.array_equal(pred, gold):
                diff = pred != gold
                pos = np.flatnonzero(diff)
                for k in range(len(TEMPLATES)):
                    ids = ids_k[k]
                    np.add.at(weights[k], (ids[pos], gold[pos]), 1.0)
                    np.add.at(weights[k], (ids[pos], pred[pos]), -1.0)
                    np.add.at(acc[k], (ids[pos], gold[pos]), float(c))
                    np.add.at(acc[k], (ids[pos], pred[pos]), -float(c))
                if T > 1:
                    gb = np.ravel_multi_index((gold[:-1], gold[1:]), trans.shape)
                    pb = np.ravel_multi_index((pred[:-1], pred[1:]), trans.shape)
                    np.add.at(trans.ravel(), gb, 1.0)
                    np.add.at(trans.ravel(), pb, -1.0)
                    np.add.at(trans_acc.ravel(), gb, float(c))
                    np.add.at(trans_acc.ravel(), pb, -float(c))
            c += 1

    avg_w = [
        (w - a / float(c)).astype(np.float32) for w, a in zip(weights, acc)
    ]
    avg_t = (trans - trans_acc / float(c)).astype(np.float32)
    return CrfModel(vocabs, avg_w, avg_t)


def train_logistic(
    sequences: list[tuple[list[np.ndarray], np.ndarray]],
    n_iter: int = 10,
    seed: int = 42,
    lr: float = 0.5,
) -> CrfModel:
    """SECOND scorer family behind the same broadcast/decode interface.

    The reference swaps its sequence scorer by config (wapiti CRF ↔ delft
    BiLSTM, /root/reference/resources/config/grobid-astro.yaml:7-8,14-19)
    while the calling pipeline is unchanged. This is our equivalent plug:
    per-token multinomial logistic regression (maxent) over the SAME
    factorized feature templates — full-batch softmax/cross-entropy
    gradient steps, deterministic (no sampling, fixed iteration order) —
    with the transition matrix fixed to add-1-smoothed gold-bigram
    log-probabilities (a generative prior) instead of discriminatively
    learned scores. The artifact is CrfModel-shaped (vocabs/weights/trans),
    so ``emissions`` + ``viterbi_batched`` and the broadcast payload work
    unchanged; only the training family differs.
    """
    del seed  # deterministic without randomness: full-batch, fixed order
    per_seq_values: list[list[np.ndarray]] = []
    golds: list[np.ndarray] = []
    for cols, gold in sequences:
        sid = np.zeros(len(gold), dtype=np.int64)
        per_seq_values.append(template_values(cols, sid))
        golds.append(np.asarray(gold, dtype=np.int64))
    vocabs = build_vocabs(per_seq_values)
    ids_all = [
        np.concatenate(
            [
                np.array([vocabs[k][v] for v in vals[k]], dtype=np.int64)
                for vals in per_seq_values
            ]
        )
        for k in range(len(TEMPLATES))
    ]
    y = np.concatenate(golds)
    n = len(y)
    onehot = np.zeros((n, N_LABELS), dtype=np.float64)
    onehot[np.arange(n), y] = 1.0

    weights = [np.zeros((len(v) + 1, N_LABELS), dtype=np.float64) for v in vocabs]
    for epoch in range(n_iter):
        emit = np.zeros((n, N_LABELS), dtype=np.float64)
        for k in range(len(TEMPLATES)):
            emit += weights[k][ids_all[k]]
        emit -= emit.max(axis=1, keepdims=True)
        p = np.exp(emit)
        p /= p.sum(axis=1, keepdims=True)
        grad = (p - onehot) * (lr / (1.0 + 0.02 * epoch))
        for k in range(len(TEMPLATES)):
            np.subtract.at(weights[k], ids_all[k], grad)

    # generative transition prior from gold bigrams (add-1 smoothing)
    counts = np.ones((N_LABELS, N_LABELS), dtype=np.float64)
    for g in golds:
        if len(g) > 1:
            np.add.at(counts, (g[:-1], g[1:]), 1.0)
    trans = np.log(counts / counts.sum(axis=1, keepdims=True))
    return CrfModel(
        vocabs,
        [w.astype(np.float32) for w in weights],
        trans.astype(np.float32),
    )
