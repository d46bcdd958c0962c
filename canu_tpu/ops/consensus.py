"""Consensus generation for tigs.

quick_mosaic == the reference's `utgcns -quick` mosaic mode
(/root/reference/src/utgcns/utgcns.C:60-530, unitigConsensus::generateQuick):
stitch reads across the tig left to right, each read contributing the
bases past the previous read's end.  Draft quality = read quality; used
for the round-1 end-to-end slice and as the backbone for the real
pileup/POA consensus (falcon-sense / pbdagcon equivalents, see
canu_tpu.ops.falcon).
"""

from __future__ import annotations

import numpy as np

from ..stores.readset import ReadSet
from ..stores.tigs import Tig
from ..utils import bitpack


def oriented_codes(readset: ReadSet, read_id: int, rev: bool) -> np.ndarray:
    codes = readset.get_codes(int(read_id))
    return bitpack.revcomp_codes(codes) if rev else codes


def quick_mosaic(readset: ReadSet, tig: Tig) -> np.ndarray:
    """Mosaic consensus codes for a tig (positions are hang-estimates, so
    junctions may be locally off by the overlap's indel imbalance)."""
    order = np.argsort(tig.bgn, kind="stable")
    out: list[np.ndarray] = []
    cur_end = None
    for i in order:
        codes = oriented_codes(readset, tig.read_id[i], bool(tig.rev[i]))
        bgn, end = int(tig.bgn[i]), int(tig.end[i])
        if cur_end is None:
            out.append(codes)
            cur_end = end
            continue
        if end <= cur_end:  # contained in already-emitted span
            continue
        skip = cur_end - bgn  # bases of this read already covered
        if skip < 0:  # gap (shouldn't happen inside a unitig): butt-join
            skip = 0
        if skip < len(codes):
            out.append(codes[skip:])
        cur_end = end
    if not out:
        return np.zeros(0, np.uint8)
    return np.concatenate(out)


def polish_tig(
    readset: ReadSet,
    tig: Tig,
    backbone: np.ndarray,
    band: int = 256,
    min_cov: int = 2,
    slack: int = 100,
    batch: int = 64,
    max_coverage: int = 40,
) -> np.ndarray:
    """Plurality-polish a mosaic backbone with the tig's own reads.

    The pbdagcon/abAbacus role of the reference consensus
    (/root/reference/src/utgcns/utgcns.C generatePBDAG: reads aligned to
    a backbone, per-column consensus): each placed read aligns to its
    backbone window (placement +- slack); votes accumulate on backbone
    coordinates; plurality calls fall back to the backbone base where
    coverage < min_cov.
    """
    from .votepile import _pow2_at_least
    from .voting import VoteArrays, plurality_call, run_alignment_batches

    B_len = len(backbone)
    jobs: list[tuple] = []
    max_win = 256
    # evidence cap (stashContains equivalent, /root/reference/src/utgcns/
    # stashContains.C): longest reads first, skip a read whose whole span
    # is already covered max_coverage deep
    order = np.argsort(-(tig.end - tig.bgn), kind="stable")
    depth = np.zeros(B_len + 1, np.int32)
    for i in order:
        codes = oriented_codes(readset, int(tig.read_id[i]), bool(tig.rev[i]))
        lo = max(0, int(tig.bgn[i]) - slack)
        hi = min(B_len, int(tig.end[i]) + slack)
        if hi - lo < 100:
            continue
        if depth[lo:hi].min() >= max_coverage:
            continue
        depth[lo:hi] += 1
        jobs.append((0, lo, backbone[lo:hi], codes))
        max_win = max(max_win, hi - lo)
    votes_of = {0: VoteArrays.zeros(B_len)}
    n_rows = _pow2_at_least(max_win)
    run_alignment_batches(jobs, votes_of, band, n_rows, batch)
    seq, _cov = plurality_call(
        votes_of[0], backbone, min_cov, keep_template_where_unsupported=True
    )
    return seq
