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
