"""Orphan merging and bubble classification (mergeOrphans equivalent).

Re-implements the reference bogart's mergeOrphans/popBubbles phase
(/root/reference/src/bogart/AS_BAT_MergeOrphans.C, driven at
bogart.C:469-478): a small tig whose reads can ALL be placed (via
overlaps) into one larger tig is an *orphan* — its reads are moved into
the larger tig and the small tig disappears; a tig whose ends anchor
into a larger tig but whose middle differs is a *bubble* — it is kept
but classified out of the primary contig set.

Placement is by overlap projection: each overlap (r in small tig, b in
target tig) maps r's full extent into target-tig coordinates through
b's placement, the same arithmetic the reference does with
PlaceReadUsingOverlaps (AS_BAT_PlaceReadUsingOverlaps.C).  The best
scoring overlap wins; placements must agree (median filter) for the
orphan to merge.
"""

from __future__ import annotations

import numpy as np

from ..stores.overlaps import OverlapStore
from ..stores.tigs import CLASS_BUBBLE, CLASS_CONTIG, Tig, TigStore
from .repeats import tig_read_index


def _place_read_in_tig(
    store: OverlapStore,
    r: int,
    target: int,
    tig_of: np.ndarray,
    p_lo: np.ndarray,
    p_hi: np.ndarray,
    p_rev: np.ndarray,
    read_len: int,
):
    """Best-overlap projection of read r into tig `target`.

    Returns (t_lo, t_hi, rev, score) or None.  Coordinates may run past
    the tig ends (clamped by the caller); rev is r's orientation in the
    tig.
    """
    s, e = store.row_range(r)
    if s == e:
        return None
    b = store.b_id[s:e]
    sel = tig_of[b] == target
    if not sel.any():
        return None
    idx = np.flatnonzero(sel)
    span = (store.a_end[s:e][sel] - store.a_bgn[s:e][sel]).astype(np.float64)
    score = span * (1.0 - store.erate[s:e][sel])
    best = idx[np.argmax(score)]
    row = s + best
    bb = int(store.b_id[row])
    a_bgn, a_end = int(store.a_bgn[row]), int(store.a_end[row])
    b_bgn, b_end = int(store.b_bgn[row]), int(store.b_end[row])
    flipped = bool(store.flipped[row])
    lo_b, hi_b, rev_b = int(p_lo[bb]), int(p_hi[bb]), bool(p_rev[bb])
    # r extent in b-forward coords
    if not flipped:
        y_lo = b_bgn - a_bgn
        y_hi = y_lo + read_len
    else:
        y_hi = b_end + a_bgn
        y_lo = y_hi - read_len
    # b-forward -> tig coords through b's placement
    if not rev_b:
        t_lo, t_hi = lo_b + y_lo, lo_b + y_hi
    else:
        t_lo, t_hi = hi_b - y_hi, hi_b - y_lo
    rev_r = rev_b ^ flipped
    return t_lo, t_hi, rev_r, float(score.max())


def merge_orphans(
    tigs: TigStore,
    store: OverlapStore,
    read_lengths: np.ndarray,
    max_orphan_reads: int = 50,
    place_fraction_bubble: float = 0.8,
) -> tuple[TigStore, int, int]:
    """Merge orphan tigs into their targets; classify bubbles.

    Returns (new store, n_orphans_merged, n_bubbles_marked).  Tig sizes
    above max_orphan_reads are never considered (reference caps bubble
    candidates similarly).
    """
    n_reads = len(read_lengths)
    tig_of, p_lo, p_hi, p_rev = tig_read_index(tigs, n_reads)
    sizes = {t.tig_id: t.length for t in tigs}
    extras: dict[int, list[tuple[int, int, int, bool]]] = {}
    dropped: set[int] = set()
    n_orphan = n_bubble = 0

    for tig in tigs:
        if tig.tig_class != CLASS_CONTIG or tig.n_reads > max_orphan_reads:
            continue
        # vote for a target: the tig most overlapped by this tig's reads
        votes: dict[int, int] = {}
        for r in tig.read_id:
            s, e = store.row_range(int(r))
            tt = tig_of[store.b_id[s:e]]
            for t in np.unique(tt[(tt > 0) & (tt != tig.tig_id)]):
                t = int(t)
                if t not in dropped:
                    votes[t] = votes.get(t, 0) + 1
        if not votes:
            continue
        target, n = max(votes.items(), key=lambda kv: kv[1])
        if sizes.get(target, 0) <= tig.length or n < place_fraction_bubble * tig.n_reads:
            continue
        # try placing every read
        placements = []
        for r in tig.read_id:
            p = _place_read_in_tig(
                store, int(r), target, tig_of, p_lo, p_hi, p_rev,
                int(read_lengths[int(r) - 1]),
            )
            placements.append(p)
        placed = [p for p in placements if p is not None]
        if len(placed) == tig.n_reads:
            # orphan: move all reads into the target
            ex = extras.setdefault(target, [])
            for r, p in zip(tig.read_id, placements):
                ex.append((int(r), p[0], p[1], p[2]))
            dropped.add(tig.tig_id)
            n_orphan += 1
        elif len(placed) >= place_fraction_bubble * tig.n_reads:
            tig.tig_class = CLASS_BUBBLE
            n_bubble += 1

    out = TigStore()
    next_id = 1
    for tig in tigs:
        if tig.tig_id in dropped:
            continue
        if tig.tig_id in extras:
            ex = extras[tig.tig_id]
            rid = np.concatenate([tig.read_id, np.array([e[0] for e in ex], np.int32)])
            bgn = np.concatenate([tig.bgn, np.array([e[1] for e in ex], np.int32)])
            end = np.concatenate([tig.end, np.array([e[2] for e in ex], np.int32)])
            rev = np.concatenate([tig.rev, np.array([e[3] for e in ex], bool)])
            shift = int(bgn.min())
            order = np.argsort(bgn, kind="stable")
            out.add(Tig(next_id, rid[order], (bgn - shift)[order],
                        (end - shift)[order], rev[order], tig.tig_class))
        else:
            out.add(Tig(next_id, tig.read_id, tig.bgn, tig.end, tig.rev,
                        tig.tig_class, tig.consensus))
        next_id += 1
    return out, n_orphan, n_bubble
