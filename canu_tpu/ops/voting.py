"""Shared plurality-voting machinery for correction and consensus polish.

The falcon-sense (t_pos, delta, base) alignment-tag voting of the
reference (/root/reference/src/correction/falconConsensus-alignTag.C)
and the column calls of abAbacus/pbdagcon consensus
(/root/reference/src/utgcns/libcns, libpbutgcns/AlnGraphBoost.C) reduce
to the same primitive: accumulate per-template-position votes
(base / deletion / insertion+base) from evidence alignments, then take
the plurality.  Both canu_tpu.ops.falcon (read correction) and the
contig polish stage build on this module.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .trace import align_positions


@dataclass
class VoteArrays:
    base: np.ndarray  # int32 [t_len, 4]
    dele: np.ndarray  # int32 [t_len]
    ins: np.ndarray  # int32 [t_len + 1]
    ins_base: np.ndarray  # int32 [t_len + 1, 4]

    @classmethod
    def zeros(cls, t_len: int) -> "VoteArrays":
        return cls(
            np.zeros((t_len, 4), np.int32),
            np.zeros(t_len, np.int32),
            np.zeros(t_len + 1, np.int32),
            np.zeros((t_len + 1, 4), np.int32),
        )


def accumulate_votes(
    votes: VoteArrays,
    t_bgn: int,
    t_sub_len: int,
    e_codes: np.ndarray,
    js: np.ndarray,  # int64 [t_sub_len + 1] evidence coord per template pos
) -> None:
    """Add one evidence alignment's votes (vectorized np.add.at)."""
    e_len = len(e_codes)
    dj = np.diff(js)
    pos = np.arange(t_sub_len, dtype=np.int64) + t_bgn
    # rows where the evidence hasn't started / has already ended carry no
    # information (j pinned at 0 or e_len by the window edges)
    active = (js[1:] > 0) & (js[:-1] < e_len)
    m = active & (dj >= 1)
    bidx = np.clip(js[1:][m] - 1, 0, e_len - 1)
    np.add.at(votes.base, (pos[m], e_codes[bidx].astype(np.int64)), 1)
    np.add.at(votes.dele, pos[active & (dj == 0)], 1)
    mi = active & (dj >= 2)
    ib = np.clip(js[:-1][mi], 0, e_len - 1)
    np.add.at(votes.ins, pos[mi], 1)
    np.add.at(votes.ins_base, (pos[mi], e_codes[ib].astype(np.int64)), 1)


def run_alignment_batches(
    jobs: list[tuple],  # (key, t_bgn, t_codes_sub, e_codes_sub)
    votes_of: dict,
    band: int,
    n_rows: int,
    batch: int = 64,
) -> None:
    """Align all (template-sub, evidence-sub) jobs and accumulate votes.

    `votes_of[key]` must be a pre-created VoteArrays sized to the full
    template; job template slices vote at offset t_bgn.

    Jobs are sorted by template-span length and each batch runs at the
    smallest power-of-two row count that fits it — alignment work is
    span-sized, not readset-max-sized (n_rows is only an upper bound,
    and a handful of pow2 shapes bounds recompiles).
    """
    jobs = sorted(jobs, key=lambda j: -len(j[2]))
    for s in range(0, len(jobs), batch):
        chunk = jobs[s : s + batch]
        bmax = max(max(len(j[2]) for j in chunk), max(len(j[3]) for j in chunk), 128)
        b_rows = 1 << (bmax - 1).bit_length()
        b_rows = min(b_rows, n_rows) if n_rows else b_rows
        L = b_rows + band
        t_arr = np.zeros((batch, L), np.uint8)
        e_arr = np.zeros((batch, L), np.uint8)
        tl = np.zeros(batch, np.int32)
        el = np.zeros(batch, np.int32)
        cen = np.zeros((batch, b_rows + 1), np.int32)
        for i, (_, _, tc, ec) in enumerate(chunk):
            t_arr[i, : len(tc)] = tc
            e_arr[i, : len(ec)] = ec
            tl[i] = len(tc)
            el[i] = len(ec)
            cen[i, : len(tc) + 1] = np.round(
                np.linspace(0, len(ec), len(tc) + 1)
            ).astype(np.int32)
            cen[i, len(tc) + 1 :] = len(ec)
        j_star, _ = align_positions(
            jnp.asarray(t_arr), jnp.asarray(tl), jnp.asarray(e_arr), jnp.asarray(el),
            jnp.asarray(cen), band, b_rows,
        )
        j_star = np.asarray(j_star)
        for i, (key, t_bgn, tc, ec) in enumerate(chunk):
            accumulate_votes(
                votes_of[key], t_bgn, len(tc), ec, j_star[i, : len(tc) + 1].astype(np.int64)
            )


def plurality_call(
    votes: VoteArrays,
    template: np.ndarray,  # uint8 codes (votes once for itself)
    min_cov: int,
    keep_template_where_unsupported: bool,
):
    """Apply plurality calls; returns (seq_or_pieces, cov).

    keep_template_where_unsupported=True (contig polish): one sequence,
    falling back to the template base where coverage < min_cov.
    False (read correction): a list of piece code-arrays split at
    low-coverage gaps (falcon-sense splitting).
    """
    t_len = len(template)
    bv = votes.base.copy()
    bv[np.arange(t_len), template] += 1
    cov = bv.sum(axis=1) + votes.dele
    call = np.argmax(bv, axis=1).astype(np.uint8)
    delete = votes.dele * 2 > cov
    insert_after = votes.ins[:t_len] * 2 > np.maximum(cov, 1)
    ins_call = np.argmax(votes.ins_base[:t_len], axis=1).astype(np.uint8)
    supported = cov >= min_cov
    if keep_template_where_unsupported:
        call = np.where(supported, call, template)
        delete = delete & supported
        insert_after = insert_after & supported
        seq = _interleave(call, ~delete, insert_after, ins_call)
        return seq, cov

    # piece mode: maximal supported runs
    pieces: list[np.ndarray] = []
    padded = np.concatenate([[False], supported, [False]])
    starts = np.flatnonzero(~padded[:-1] & padded[1:])
    ends = np.flatnonzero(padded[:-1] & ~padded[1:])
    for b, e in zip(starts, ends):
        idx = np.arange(b, e)
        seq = _interleave(call[idx], ~delete[idx], insert_after[idx], ins_call[idx])
        pieces.append(seq)
    return pieces, cov


def _interleave(
    bases: np.ndarray, keep: np.ndarray, ins_here: np.ndarray, ins_call: np.ndarray
) -> np.ndarray:
    """Emit [ins?][base?] per position, vectorized."""
    contrib = ins_here.astype(np.int64) + keep.astype(np.int64)
    off = np.zeros(len(bases) + 1, np.int64)
    np.cumsum(contrib, out=off[1:])
    out = np.empty(int(off[-1]), np.uint8)
    ii = np.flatnonzero(ins_here)
    out[off[ii]] = ins_call[ii]
    kk = np.flatnonzero(keep)
    out[off[kk] + ins_here[kk]] = bases[kk]
    return out
