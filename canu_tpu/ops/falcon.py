"""Falcon-sense read correction (falconsense equivalent).

Re-implements the reference's correction stage value chain —
generateCorrectionLayouts (evidence pick by score,
/root/reference/src/correction/generateCorrectionLayouts.C:89-204),
filterCorrectionLayouts (which reads to correct: longest first up to
corOutCoverage x genomeSize, /root/reference/src/correction/
filterCorrectionLayouts.C:49-120), and falconsense itself (alignTag
weighted plurality voting, /root/reference/src/correction/
falconConsensus-alignTag.C) — on the device vote-pile engine
(canu_tpu.ops.votepile):

  * evidence selection is one columnar pass over the whole overlap
    store (lexsort by (template, -score), segmented coverage budget);
  * evidence windows are aligned and voted ENTIRELY on device; per
    template column exactly one packed decision byte returns to host;
  * the corrected read is the plurality call over positions with
    coverage >= min_cov, split into pieces at low-coverage gaps exactly
    like falcon-sense splits uncorrectable regions.

The reference runs this as memory-modelled grid job arrays over read
ranges (/root/reference/src/pipelines/canu/CorrectReads.pm:122-180,
falconsense.C:301 OpenMP over reads); here the array axis is the
template-block slot dimension of the vote accumulator.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from ..stores.overlaps import OverlapStore
from ..stores.readset import ReadSet
from ..utils import bitpack
from .votepile import (
    VoteJobs,
    _finalize_plurality,
    block_geometry,
    decode_pieces,
    device_words,
    pile_votes,
)


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


def select_evidence_rows(
    st: OverlapStore,
    template_ids: np.ndarray,
    lengths: np.ndarray,
    max_evidence_coverage: int,
    min_evidence_length: int,
) -> np.ndarray:
    """Store row indices of the evidence kept per template: best-scoring
    overlaps first until the per-template coverage budget
    (filterCorrectionOverlaps / corMaxEvidenceCoverage semantics), as one
    columnar pass over the whole store."""
    is_tpl = np.zeros(st.n_reads + 2, bool)
    is_tpl[template_ids] = True
    rows = np.flatnonzero(is_tpl[st.a_id])
    if len(rows) == 0:
        return rows
    span = (st.a_end[rows] - st.a_bgn[rows]).astype(np.int64)
    ok = span >= max(100, min_evidence_length, 1)
    rows, span = rows[ok], span[ok]
    a = st.a_id[rows]
    score = span * (1.0 - st.erate_q[rows].astype(np.float64) / 10000.0)
    order = np.lexsort((-score, a))
    rows, span, a = rows[order], span[order], a[order]
    # segmented prefix sums: acc_prev = evidence bases already accepted
    # for this template before this row
    new_seg = np.concatenate([[True], a[1:] != a[:-1]])
    cs = np.cumsum(span)
    seg_off = np.maximum.accumulate(np.where(new_seg, cs - span, 0))
    acc_prev = (cs - span) - seg_off
    budget = max_evidence_coverage * lengths[a - 1].astype(np.int64)
    return rows[acc_prev < budget]


def evidence_vote_jobs(
    st: OverlapStore, rows: np.ndarray, lengths: np.ndarray,
    mean_qv: np.ndarray | None = None,
) -> VoteJobs:
    """Store rows -> columnar device vote jobs (oriented evidence coords).

    When per-read mean QVs are given (raw FASTQ input), each evidence
    job's votes are weighted 1 + meanQV/256 — a quality tie-break at
    ~1-phred granularity (the reference's falconsense tag weights,
    /root/reference/src/correction/falconConsensus-alignTag.C, are
    uniform; QV weighting replaces the historical quality trim role)."""
    tid = st.a_id[rows]
    b_id = st.b_id[rows]
    fl = st.flipped[rows]
    t_bgn = st.a_bgn[rows].astype(np.int32)
    t_span = (st.a_end[rows] - st.a_bgn[rows]).astype(np.int32)
    lb = lengths[b_id - 1].astype(np.int32)
    e_lo = np.where(fl, lb - st.b_end[rows], st.b_bgn[rows]).astype(np.int32)
    e_span = (st.b_end[rows] - st.b_bgn[rows]).astype(np.int32)
    keep = (e_span > 0) & (t_span > 0)
    weight = None
    if mean_qv is not None:
        weight = (1.0 + mean_qv[b_id[keep] - 1] / 256.0).astype(np.float32)
    return VoteJobs(
        t_idx=(tid[keep] - 1).astype(np.int32),
        e_idx=(b_id[keep] - 1).astype(np.int32),
        t_bgn=t_bgn[keep],
        t_span=t_span[keep],
        e_lo=e_lo[keep],
        e_span=e_span[keep],
        flipped=fl[keep].astype(bool),
        slot=np.zeros(int(keep.sum()), np.int32),  # filled per block
        weight=weight,
    )


def template_blocks(lengths: np.ndarray, template_ids: np.ndarray):
    """Group templates (longest first) into device vote blocks.

    Returns [(tids, G, Lt), ...]; ALL blocks share one (G, Lt) geometry
    sized for the longest template.  Remote-TPU compiles of the vote
    program run minutes-to-tens-of-minutes per shape (measured on the
    axon tunnel), so one geometry per run — short templates wasting
    padded columns — beats per-block geometries by the clock."""
    order = np.argsort(-lengths[template_ids - 1], kind="stable")
    tids = template_ids[order]
    if len(tids) == 0:
        return []
    G, Lt = block_geometry(int(lengths[tids[0] - 1]))
    return [(tids[i : i + G], G, Lt) for i in range(0, len(tids), G)]


def run_vote_blocks(
    rs: ReadSet,
    jobs: VoteJobs,
    template_ids: np.ndarray,
    band: int,
    finalize,
    skip=frozenset(),
):
    """Shared block loop: group templates, pile votes per block on device,
    finalize (a callable (words, lengths, t_idx, votes, Lt, n_live) ->
    device array [G, Lt, ...]), yield (block_index, tids, host_result)
    per block.  Block indices are deterministic for a given (readset,
    template selection); ``skip`` suppresses all device work for those
    indices (resume support — the reference re-runs only failed array
    elements, Execution.pm convertToJobRange)."""
    words_d, len_d = device_words(rs)
    pad_row = rs.n_reads  # trailing all-zero row of the device planes
    blocks = template_blocks(rs.length, template_ids)
    slot_of = np.zeros(rs.n_reads + 1, np.int32)
    block_of = np.full(rs.n_reads + 1, -1, np.int32)
    for bi, (bt, G, Lt) in enumerate(blocks):
        block_of[bt] = bi
        slot_of[bt] = np.arange(len(bt), dtype=np.int32)
    jb = block_of[jobs.t_idx + 1]
    order = np.argsort(jb, kind="stable")
    bounds = np.searchsorted(jb[order], np.arange(len(blocks) + 1))
    import jax.numpy as jnp

    for bi, (bt, G, Lt) in enumerate(blocks):
        if bi in skip:
            continue
        take = order[bounds[bi] : bounds[bi + 1]]
        block_jobs = VoteJobs(
            t_idx=jobs.t_idx[take],
            e_idx=jobs.e_idx[take],
            t_bgn=jobs.t_bgn[take],
            t_span=jobs.t_span[take],
            e_lo=jobs.e_lo[take],
            e_span=jobs.e_span[take],
            flipped=jobs.flipped[take],
            slot=slot_of[jobs.t_idx[take] + 1],
            weight=None if jobs.weight is None else jobs.weight[take],
        )
        votes = pile_votes(words_d, len_d, words_d, len_d, block_jobs, G, Lt,
                           band=band)
        t_idx_block = np.full(G, pad_row, np.int32)
        t_idx_block[: len(bt)] = bt - 1
        res = finalize(words_d, len_d, jnp.asarray(t_idx_block), votes, Lt)
        yield bi, bt, np.asarray(res)


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
    batch: int = 0,  # unused (device engine sizes its own chunks)
    qv_weight: bool = True,
) -> Iterator[tuple[str, str]]:
    """Yield (name, corrected_sequence) for selected templates."""
    for _bi, items in correct_reads_blocks(
        rs, st, genome_size, out_coverage, max_evidence_coverage,
        min_evidence_length, band, min_cov, min_piece, qv_weight,
    ):
        yield from items


def correct_reads_blocks(
    rs: ReadSet,
    st: OverlapStore,
    genome_size: float,
    out_coverage: int = 40,
    max_evidence_coverage: int = 40,
    min_evidence_length: int = 0,
    band: int = 256,
    min_cov: int = 4,
    min_piece: int = 1000,
    qv_weight: bool = True,
    done_blocks=frozenset(),
) -> Iterator[tuple[int, list[tuple[str, str]]]]:
    """Yield (block_index, [(name, corrected_seq), ...]) per template
    block.  Block indices are deterministic for a given store+config, so
    a caller can persist each block's output and resume with
    ``done_blocks`` after a crash — the correction equivalent of the
    reference's per-jobid batch arrays
    (/root/reference/src/pipelines/canu/CorrectReads.pm:122-141)."""
    template_ids = select_templates(rs, genome_size, out_coverage)
    rows = select_evidence_rows(
        st, template_ids, rs.length, max_evidence_coverage, min_evidence_length
    )
    mean_qv = rs.mean_quals() if (qv_weight and rs.has_quals) else None
    jobs = evidence_vote_jobs(st, rows, rs.length, mean_qv=mean_qv)
    # only templates with any evidence produce output (falcon-sense skips
    # evidence-free reads); piles for the rest would be all-unsupported
    has_ev = np.zeros(rs.n_reads + 1, bool)
    has_ev[jobs.t_idx + 1] = True
    template_ids = template_ids[has_ev[template_ids]]
    if len(template_ids) == 0:
        return

    def finalize(words_d, len_d, t_idx, votes, Lt):
        packed, _cov = _finalize_plurality(
            words_d, len_d, t_idx, votes, float(min_cov), Lt, False
        )
        return packed

    for bi, bt, packed in run_vote_blocks(
        rs, jobs, template_ids, band, finalize, skip=done_blocks
    ):
        items: list[tuple[str, str]] = []
        for g, tid in enumerate(bt):
            row = packed[g, : int(rs.length[tid - 1])]
            out_idx = 0
            for _pos, seq in decode_pieces(row):
                if len(seq) < min_piece:
                    continue
                items.append(
                    (f"{rs.name(int(tid))}_corr{out_idx}", bitpack.codes_to_seq(seq))
                )
                out_idx += 1
        yield bi, items
