"""Falcon-sense read correction (falconsense equivalent).

Re-implements the reference's correction stage value chain —
generateCorrectionLayouts (evidence pick by score,
/root/reference/src/correction/generateCorrectionLayouts.C:89-204),
filterCorrectionLayouts (which reads to correct: longest first up to
corOutCoverage x genomeSize, /root/reference/src/correction/
filterCorrectionLayouts.C:49-120), and falconsense itself (alignTag
weighted plurality voting, /root/reference/src/correction/
falconConsensus-alignTag.C) — on the TPU alignment-positions kernel and
the shared voting machinery (canu_tpu.ops.voting):

  * evidence alignments are batched banded fwd+bwd DPs giving the
    evidence coordinate at every template position (no tracebacks);
  * votes accumulate via vectorized np.add.at;
  * the corrected read is the plurality call over positions with
    coverage >= min_cov, split into pieces at low-coverage gaps exactly
    like falcon-sense splits uncorrectable regions.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from ..stores.overlaps import OverlapStore
from ..stores.readset import ReadSet
from ..utils import bitpack
from .voting import VoteArrays, plurality_call, run_alignment_batches


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


def evidence_jobs(rs: ReadSet, st: OverlapStore, template_ids, max_evidence_coverage, min_evidence_length):
    """(template_id, t_bgn, template_sub_codes, oriented_evidence_codes)."""
    jobs: list[tuple] = []
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
            jobs.append((int(tid), t_bgn, t_codes[t_bgn:t_end], e_codes[e_lo:e_hi]))
    return jobs


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
    jobs = evidence_jobs(rs, st, template_ids, max_evidence_coverage, min_evidence_length)
    n_rows = _pow2_at_least(max(int(rs.length.max()), 256))

    votes_of: dict[int, VoteArrays] = {}
    for tid, _, _, _ in jobs:
        if tid not in votes_of:
            votes_of[tid] = VoteArrays.zeros(int(rs.length[tid - 1]))
    run_alignment_batches(jobs, votes_of, band, n_rows, batch)

    for tid in sorted(votes_of):
        t_codes = rs.get_codes(tid)
        pieces, _cov = plurality_call(
            votes_of[tid], t_codes, min_cov, keep_template_where_unsupported=False
        )
        out_idx = 0
        for seq in pieces:
            if len(seq) < min_piece:
                continue
            yield f"{rs.name(tid)}_corr{out_idx}", bitpack.codes_to_seq(seq)
            out_idx += 1
