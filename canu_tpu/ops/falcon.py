"""Falcon-sense read correction (falconsense equivalent).

Re-implements the reference's correction stage value chain —
generateCorrectionLayouts (evidence pick by score,
/root/reference/src/correction/generateCorrectionLayouts.C:89-204),
filterCorrectionLayouts (which reads to correct: longest first up to
corOutCoverage x genomeSize, /root/reference/src/correction/
filterCorrectionLayouts.C:49-120), and falconsense itself (alignTag
weighted plurality voting, /root/reference/src/correction/
falconConsensus-alignTag.C) — on the TPU alignment-positions kernel:

  * evidence alignments are batched banded fwd+bwd DPs
    (canu_tpu.ops.trace.align_positions) giving the evidence coordinate
    at every template position;
  * votes (base / deletion / insertion+base) accumulate in numpy via
    vectorized np.add.at — the falcon (t_pos, delta, base) tag plurality
    without per-base Python;
  * the corrected read is the plurality call over positions with
    coverage >= min_cov, split into pieces at low-coverage gaps exactly
    like falcon-sense splits uncorrectable regions.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import jax.numpy as jnp
import numpy as np

from ..stores.overlaps import OverlapStore
from ..stores.readset import ReadSet
from ..utils import bitpack
from .trace import align_positions


@dataclass
class EvidenceJob:
    template_id: int
    t_bgn: int
    t_end: int
    ev_codes: np.ndarray  # oriented evidence slice


def select_templates(
    rs: ReadSet, genome_size: float, out_coverage: int
) -> np.ndarray:
    """Longest reads first until out_coverage * genome_size total bases
    (filterCorrectionLayouts.C:383-384 semantics). 1-based ids."""
    order = np.argsort(-rs.length, kind="stable")
    csum = np.cumsum(rs.length[order])
    n_keep = int(np.searchsorted(csum, out_coverage * genome_size)) + 1
    ids = np.sort(order[:n_keep] + 1)
    return ids.astype(np.int32)


def select_evidence(
    st: OverlapStore,
    template_id: int,
    t_len: int,
    max_evidence_coverage: int,
    min_evidence_length: int,
):
    """Best-scoring overlaps up to the evidence coverage cap
    (filterCorrectionOverlaps / corMaxEvidenceCoverage semantics)."""
    o = st.overlaps_for(template_id)
    span = (o["a_end"] - o["a_bgn"]).astype(np.int64)
    keep = span >= max(1, min_evidence_length)
    idx = np.flatnonzero(keep)
    score = span[idx] * (1.0 - o["erate_q"][idx] / 10000.0)
    order = idx[np.argsort(-score, kind="stable")]
    budget = max_evidence_coverage * t_len
    acc = np.cumsum(span[order])
    n = int(np.searchsorted(acc, budget)) + 1
    return {k: v[order[:n]] for k, v in o.items()}


def _pow2_at_least(x: int) -> int:
    return 1 << max(0, int(x - 1).bit_length())


def correct_reads(
    rs: ReadSet,
    st: OverlapStore,
    genome_size: float,
    out_coverage: int = 40,
    max_evidence_coverage: int = 40,
    min_evidence_length: int = 0,
    band: int = 256,
    min_cov: int = 4,
    min_piece: int = 1000,
    batch: int = 64,
) -> Iterator[tuple[str, str]]:
    """Yield (name, corrected_sequence) for selected templates."""
    template_ids = select_templates(rs, genome_size, out_coverage)
    # one DP shape for the whole run: template spans bounded by max read
    n_rows = _pow2_at_least(max(int(rs.length.max()), 256))
    L = n_rows + band

    # build the job list (host) then process in batches
    jobs: list[tuple[int, int, int, np.ndarray, np.ndarray]] = []
    # (template_id, t_bgn, t_end, t_slice, e_slice)
    per_template: dict[int, list[int]] = {}
    for tid in template_ids:
        t_len = int(rs.length[tid - 1])
        ev = select_evidence(st, int(tid), t_len, max_evidence_coverage, min_evidence_length)
        if len(ev["a_id"]) == 0:
            continue
        t_codes = rs.get_codes(int(tid))
        for r in range(len(ev["a_id"])):
            b_id = int(ev["b_id"][r])
            flipped = bool(ev["flipped"][r])
            t_bgn, t_end = int(ev["a_bgn"][r]), int(ev["a_end"][r])
            if t_end - t_bgn < 100:
                continue
            e_codes = rs.get_codes(b_id)
            if flipped:
                e_codes = bitpack.revcomp_codes(e_codes)
                e_lo = int(rs.length[b_id - 1]) - int(ev["b_end"][r])
                e_hi = int(rs.length[b_id - 1]) - int(ev["b_bgn"][r])
            else:
                e_lo, e_hi = int(ev["b_bgn"][r]), int(ev["b_end"][r])
            per_template.setdefault(int(tid), [])
            jobs.append((int(tid), t_bgn, t_end, t_codes[t_bgn:t_end], e_codes[e_lo:e_hi]))

    # vote arrays per template, lazily
    base_votes: dict[int, np.ndarray] = {}
    del_votes: dict[int, np.ndarray] = {}
    ins_votes: dict[int, np.ndarray] = {}
    ins_base: dict[int, np.ndarray] = {}

    def ensure(tid: int) -> None:
        if tid not in base_votes:
            t_len = int(rs.length[tid - 1])
            base_votes[tid] = np.zeros((t_len, 4), np.int32)
            del_votes[tid] = np.zeros(t_len, np.int32)
            ins_votes[tid] = np.zeros(t_len + 1, np.int32)
            ins_base[tid] = np.zeros((t_len + 1, 4), np.int32)

    for s in range(0, len(jobs), batch):
        chunk = jobs[s : s + batch]
        B = len(chunk)
        t_arr = np.zeros((batch, L), np.uint8)
        e_arr = np.zeros((batch, L), np.uint8)
        tl = np.zeros(batch, np.int32)
        el = np.zeros(batch, np.int32)
        cen = np.zeros((batch, n_rows + 1), np.int32)
        for i, (_, _, _, tc, ec) in enumerate(chunk):
            t_arr[i, : len(tc)] = tc
            e_arr[i, : len(ec)] = ec
            tl[i] = len(tc)
            el[i] = len(ec)
            cen[i, : len(tc) + 1] = np.round(
                np.linspace(0, len(ec), len(tc) + 1)
            ).astype(np.int32)
            cen[i, len(tc) + 1 :] = len(ec)
        j_star, edits = align_positions(
            jnp.asarray(t_arr), jnp.asarray(tl), jnp.asarray(e_arr), jnp.asarray(el),
            jnp.asarray(cen), band, n_rows,
        )
        j_star = np.asarray(j_star)
        for i, (tid, t_bgn, t_end, tc, ec) in enumerate(chunk):
            ensure(tid)
            js = j_star[i, : len(tc) + 1].astype(np.int64)
            dj = np.diff(js)  # per template position: evidence consumed
            pos = np.arange(len(tc), dtype=np.int64) + t_bgn
            # aligned base votes (dj >= 1): evidence base at js[i+1]-1
            m = dj >= 1
            bidx = np.clip(js[1:][m] - 1, 0, len(ec) - 1)
            np.add.at(base_votes[tid], (pos[m], ec[bidx].astype(np.int64)), 1)
            # deletion votes (dj == 0)
            np.add.at(del_votes[tid], pos[dj == 0], 1)
            # insertion votes (dj >= 2): first inserted base
            mi = dj >= 2
            ib = np.clip(js[:-1][mi], 0, len(ec) - 1)
            np.add.at(ins_votes[tid], pos[mi], 1)
            np.add.at(ins_base[tid], (pos[mi], ec[ib].astype(np.int64)), 1)

    # ---- plurality call per template ----
    for tid in sorted(base_votes):
        t_codes = rs.get_codes(tid)
        t_len = len(t_codes)
        bv = base_votes[tid]
        # the template votes for itself once (falcon includes the backbone)
        bv[np.arange(t_len), t_codes] += 1
        cov = bv.sum(axis=1) + del_votes[tid]
        call = np.argmax(bv, axis=1).astype(np.uint8)
        delete = del_votes[tid] * 2 > cov
        insert_after = ins_votes[tid][:t_len] * 2 > np.maximum(cov, 1)
        ins_call = np.argmax(ins_base[tid][:t_len], axis=1).astype(np.uint8)
        supported = cov >= min_cov

        # emit pieces over supported runs
        pieces: list[np.ndarray] = []
        run_start = None
        for i in range(t_len + 1):
            on = i < t_len and supported[i]
            if on and run_start is None:
                run_start = i
            elif not on and run_start is not None:
                pieces.append(np.arange(run_start, i))
                run_start = None
        out_idx = 0
        for piece in pieces:
            if len(piece) < min_piece:
                continue
            segs: list[np.ndarray] = []
            ppos = piece
            keep = ~delete[ppos]
            # interleave insertions: build with a python-free trick
            out = []
            bases = call[ppos]
            ins_here = insert_after[ppos]
            for k in range(len(ppos)):
                if ins_here[k]:
                    out.append(ins_call[ppos[k]])
                if keep[k]:
                    out.append(bases[k])
            seq = np.array(out, dtype=np.uint8)
            if len(seq) < min_piece:
                continue
            name = f"{rs.name(tid)}_corr{out_idx}"
            out_idx += 1
            yield name, bitpack.codes_to_seq(seq)
