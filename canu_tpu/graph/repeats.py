"""Repeat detection and tig splitting (markRepeatReads equivalent).

Re-implements the repeat phase of the reference bogart
(/root/reference/src/bogart/AS_BAT_MarkRepeatReads.C, driven at
bogart.C:498-529: build the full AssemblyGraph of alternate read
placements, annotate tig intervals covered by external evidence, then
break tigs at repeat boundaries whose boundary reads are "confused" —
an external edge scores nearly as well as the chosen internal edge,
thresholds -ca/-cp) plus the follow-up cleanup splitDiscontinuous
(bogart.C:540-560, AS_BAT_SplitDiscontinuous.C).

Redesign notes (host-side numpy over the device-verified store):

  * the reference's AssemblyGraph stores every read's alternate
    placements; here the placements are PROJECTED on the fly from the
    symmetric OverlapStore — each overlap row (a in tig T, b elsewhere)
    projects b's aligned span into T's coordinates, which is exactly the
    annotation interval markRepeatReads builds;
  * repeat regions = union of external-evidence projections supported by
    >= min_evidence distinct external reads;
  * a region triggers a break only when strictly internal to the tig and
    a read at its boundary is confused (reference confusedAbsolute /
    confusedPercent, bogart -ca/-cp, bogart.C:518-529);
  * breaks happen between reads: every read keeps one piece (midpoint
    rule), then splitDiscontinuous re-partitions any piece whose reads no
    longer tile contiguously.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..stores.overlaps import OverlapStore
from ..stores.tigs import CLASS_CONTIG, CLASS_UNASSEMBLED, Tig, TigStore


@dataclass
class RepeatRegion:
    tig_id: int
    bgn: int
    end: int
    n_evidence: int
    broke: bool


def tig_read_index(tigs: TigStore, n_reads: int):
    """Per-read tig id + placement arrays (0 = unplaced)."""
    tig_of = np.zeros(n_reads + 1, np.int32)
    lo = np.zeros(n_reads + 1, np.int32)
    hi = np.zeros(n_reads + 1, np.int32)
    rev = np.zeros(n_reads + 1, bool)
    for t in tigs:
        tig_of[t.read_id] = t.tig_id
        lo[t.read_id] = t.bgn
        hi[t.read_id] = t.end
        rev[t.read_id] = t.rev
    return tig_of, lo, hi, rev


def _project_span(
    a_bgn: np.ndarray, a_end: np.ndarray,
    r_lo: np.ndarray, r_hi: np.ndarray, r_rev: np.ndarray,
):
    """Map spans on read A (A-forward coords) into tig coords of A."""
    t_lo = np.where(r_rev, r_hi - a_end, r_lo + a_bgn)
    t_hi = np.where(r_rev, r_hi - a_bgn, r_lo + a_end)
    return t_lo, t_hi


def _merge_intervals(lo: np.ndarray, hi: np.ndarray, gap: int = 0):
    """Union of intervals; returns (lo, hi, count) arrays of merged runs."""
    if len(lo) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64)
    order = np.argsort(lo, kind="stable")
    lo, hi = lo[order].astype(np.int64), hi[order].astype(np.int64)
    out_lo, out_hi, out_n = [], [], []
    cl, ch, cn = int(lo[0]), int(hi[0]), 1
    for i in range(1, len(lo)):
        if int(lo[i]) <= ch + gap:
            ch = max(ch, int(hi[i]))
            cn += 1
        else:
            out_lo.append(cl); out_hi.append(ch); out_n.append(cn)
            cl, ch, cn = int(lo[i]), int(hi[i]), 1
    out_lo.append(cl); out_hi.append(ch); out_n.append(cn)
    return np.array(out_lo), np.array(out_hi), np.array(out_n)


def find_repeat_regions(
    tig: Tig,
    store: OverlapStore,
    tig_of: np.ndarray,
    min_evidence: int = 2,
    min_region: int = 100,
    max_erate: float | None = None,
) -> list[RepeatRegion]:
    """External-evidence repeat annotation for one tig.

    Every overlap from a tig read to a read placed in a DIFFERENT tig (or
    unplaced) projects its aligned span into tig coordinates; merged
    projections supported by >= min_evidence distinct external reads are
    repeat regions (the reference's annotation step,
    AS_BAT_MarkRepeatReads.C via AssemblyGraph placements).
    """
    pos_lo = {int(r): int(b) for r, b in zip(tig.read_id, tig.bgn)}
    spans_lo, spans_hi, ext_ids = [], [], []
    rev_map = {int(r): bool(v) for r, v in zip(tig.read_id, tig.rev)}
    hi_map = {int(r): int(e) for r, e in zip(tig.read_id, tig.end)}
    for r in tig.read_id:
        r = int(r)
        s, e = store.row_range(r)
        if s == e:
            continue
        b = store.b_id[s:e]
        ext = tig_of[b] != tig.tig_id
        if max_erate is not None:
            ext &= store.erate[s:e] <= max_erate
        if not ext.any():
            continue
        a_bgn = store.a_bgn[s:e][ext]
        a_end = store.a_end[s:e][ext]
        t_lo, t_hi = _project_span(
            a_bgn, a_end,
            np.full(len(a_bgn), pos_lo[r]),
            np.full(len(a_bgn), hi_map[r]),
            np.full(len(a_bgn), rev_map[r]),
        )
        spans_lo.append(t_lo)
        spans_hi.append(t_hi)
        ext_ids.append(b[ext])
    if not spans_lo:
        return []
    lo = np.concatenate(spans_lo)
    hi = np.concatenate(spans_hi)
    ids = np.concatenate(ext_ids)
    # count DISTINCT external reads per merged region
    mlo, mhi, _ = _merge_intervals(lo, hi)
    regions = []
    for rl, rh in zip(mlo, mhi):
        inside = (lo < rh) & (hi > rl)
        n_ev = len(np.unique(ids[inside]))
        if n_ev >= min_evidence and rh - rl >= min_region:
            regions.append(RepeatRegion(tig.tig_id, int(rl), int(rh), n_ev, False))
    return regions


def _best_scores(
    store: OverlapStore, read_id: int, tig_of: np.ndarray, tig_id: int,
) -> tuple[float, float]:
    """(best internal score, best external score) for one read.

    Score = span * (1 - erate), the BestOverlapGraph edge score.
    """
    s, e = store.row_range(read_id)
    if s == e:
        return 0.0, 0.0
    span = (store.a_end[s:e] - store.a_bgn[s:e]).astype(np.float64)
    sc = span * (1.0 - store.erate[s:e])
    internal = tig_of[store.b_id[s:e]] == tig_id
    best_int = float(sc[internal].max()) if internal.any() else 0.0
    best_ext = float(sc[~internal].max()) if (~internal).any() else 0.0
    return best_int, best_ext


def mark_repeats(
    tigs: TigStore,
    store: OverlapStore,
    read_lengths: np.ndarray,
    min_evidence: int = 2,
    min_region: int = 100,
    end_slop: int = 200,
    confused_absolute: float = 2100.0,
    confused_percent: float = 200.0,
    min_reads_per_contig: int = 2,
) -> tuple[TigStore, list[RepeatRegion]]:
    """Break contigs at confused repeat boundaries; returns (new store, regions).

    confused_absolute / confused_percent mirror bogart -ca / -cp
    (reference defaults 2100 / 200, bogart.C command line;
    AS_BAT_MarkRepeatReads.C:confused test: an external edge within
    `ca` score units AND `cp` percent of the internal edge makes the
    boundary read confused, so the tig cannot be trusted across it).
    """
    n_reads = len(read_lengths)
    tig_of, _, _, _ = tig_read_index(tigs, n_reads)
    all_regions: list[RepeatRegion] = []
    out = TigStore()
    next_id = 1

    for tig in tigs:
        if tig.tig_class != CLASS_CONTIG or tig.n_reads < 2:
            out.add(Tig(next_id, tig.read_id, tig.bgn, tig.end, tig.rev,
                        tig.tig_class, tig.consensus))
            next_id += 1
            continue
        regions = find_repeat_regions(
            tig, store, tig_of, min_evidence, min_region
        )
        tig_len = tig.length
        breaks: list[int] = []
        for reg in regions:
            # only strictly-internal regions can break a tig; regions
            # touching a tig end just mean the tig ends in repeat
            internal_l = reg.bgn > end_slop
            internal_r = reg.end < tig_len - end_slop
            if not (internal_l or internal_r):
                all_regions.append(reg)
                continue
            # boundary reads: reads whose placement crosses a region edge
            for edge, is_internal in ((reg.bgn, internal_l), (reg.end, internal_r)):
                if not is_internal:
                    continue
                crossing = (tig.bgn < edge) & (tig.end > edge)
                confused = False
                for r in tig.read_id[crossing]:
                    bi, be = _best_scores(store, int(r), tig_of, tig.tig_id)
                    if bi <= 0.0:
                        continue
                    if be >= bi - confused_absolute and be >= bi * (
                        1.0 - confused_percent / 100.0
                    ):
                        confused = True
                        break
                if confused:
                    breaks.append(int(edge))
                    reg.broke = True
            all_regions.append(reg)

        if not breaks:
            out.add(Tig(next_id, tig.read_id, tig.bgn, tig.end, tig.rev,
                        tig.tig_class, tig.consensus))
            next_id += 1
            continue

        # partition reads by midpoint against sorted break coordinates
        breaks = sorted(set(breaks))
        mid = (tig.bgn.astype(np.int64) + tig.end) // 2
        piece = np.searchsorted(np.array(breaks), mid, side="right")
        for p in np.unique(piece):
            sel = piece == p
            bgn = tig.bgn[sel]
            shift = bgn.min()
            order = np.argsort(bgn, kind="stable")
            out.add(Tig(
                next_id,
                tig.read_id[sel][order],
                (bgn - shift)[order],
                (tig.end[sel] - shift)[order],
                tig.rev[sel][order],
                CLASS_CONTIG,
            ))
            next_id += 1

    out = split_discontinuous(out, min_reads_per_contig)
    return out, all_regions


def split_discontinuous(tigs: TigStore, min_reads_per_contig: int = 2) -> TigStore:
    """Split tigs whose reads no longer tile contiguously
    (splitDiscontinuous, bogart.C:540-560): a gap in read coverage means
    the layout is two independent pieces."""
    out = TigStore()
    next_id = 1
    for tig in tigs:
        if tig.n_reads <= 1:
            out.add(Tig(next_id, tig.read_id, tig.bgn, tig.end, tig.rev,
                        tig.tig_class, tig.consensus))
            next_id += 1
            continue
        order = np.argsort(tig.bgn, kind="stable")
        bgn, end = tig.bgn[order], tig.end[order]
        rid, rev = tig.read_id[order], tig.rev[order]
        reach = np.maximum.accumulate(end)
        # piece starts where a read begins past everything seen so far
        new_piece = np.zeros(len(bgn), bool)
        new_piece[1:] = bgn[1:] > reach[:-1]
        piece = np.cumsum(new_piece)
        for p in np.unique(piece):
            sel = piece == p
            shift = bgn[sel].min()
            cls = tig.tig_class
            if cls == CLASS_CONTIG and sel.sum() < min_reads_per_contig:
                cls = CLASS_UNASSEMBLED
            out.add(Tig(
                next_id, rid[sel], bgn[sel] - shift, end[sel] - shift,
                rev[sel], cls,
                tig.consensus if piece.max() == 0 else None,
            ))
            next_id += 1
    return out
