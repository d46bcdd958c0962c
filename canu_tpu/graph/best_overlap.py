"""Best-overlap-graph unitig construction (bogart equivalent, host side).

Re-implements the core of the reference bogart phase sequence
(/root/reference/src/bogart/bogart.C:386-630) on host numpy over the
device-verified OverlapStore:

  * overlap classification into containment / 5'-dovetail / 3'-dovetail
    per read end (BestOverlapGraph semantics,
    /root/reference/src/bogart/AS_BAT_BestOverlapGraph.H:139-258);
  * best edge per read end by score (span with erate penalty), erate
    gated at the graph error rate;
  * greedy mutual-best walks build unitigs (populateUnitig,
    bogart.C:406-414) — requiring mutuality folds the reference's
    ChunkGraph mutual-best-chain seeding into the walk itself;
  * contained reads placed into their container's tig (placeContains,
    bogart.C:442-459);
  * leftover reads become singleton unassembled tigs (classification per
    contigFilter, bogart.C:562-598).

Positions are hang-arithmetic estimates (consensus refines them), like
the reference's initial tgPositions before optimizePositions.
Deliberately host-side: the graph walk is sequential pointer chasing —
the TPU's job was scoring the edges (SURVEY.md §7 step 10).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..stores.overlaps import OverlapStore
from ..stores.tigs import CLASS_CONTIG, CLASS_UNASSEMBLED, Tig, TigStore

END5, END3 = 0, 1


@dataclass
class BestEdges:
    """Per (read, end) best dovetail edge; 0 b_id = none."""

    b_id: np.ndarray  # int32 [n+1, 2]
    row: np.ndarray  # int64 [n+1, 2] row in the store for hang lookup
    contained_in: np.ndarray  # int32 [n+1], 0 = not contained
    contain_row: np.ndarray  # int64 [n+1]


class BestOverlapGraph:
    def __init__(
        self,
        store: OverlapStore,
        read_lengths: np.ndarray,  # int32 [n] (index read_id-1)
        max_erate: float = 0.30,
        end_slop: int = 100,
        min_span: int = 500,
    ):
        self.store = store
        self.n = store.n_reads
        self.read_len = read_lengths
        self.max_erate = max_erate
        self.end_slop = end_slop
        self.min_span = min_span
        self._classify()
        self._pick_best()

    def _classify(self) -> None:
        st = self.store
        len_a = self.read_len[st.a_id - 1].astype(np.int64)
        len_b = self.read_len[st.b_id - 1].astype(np.int64)
        # oriented-B span (B' = rc(B) when flipped): left/right ends of the
        # alignment on B in A-forward direction
        bp_bgn = np.where(st.flipped, len_b - st.b_end, st.b_bgn).astype(np.int64)
        bp_end = np.where(st.flipped, len_b - st.b_bgn, st.b_end).astype(np.int64)
        slop = self.end_slop
        a_l0 = st.a_bgn <= slop  # alignment reaches A's left end
        a_r0 = st.a_end >= len_a - slop
        b_l0 = bp_bgn <= slop
        b_r0 = bp_end >= len_b - slop
        span_a = (st.a_end - st.a_bgn).astype(np.int64)
        ok = (st.erate <= self.max_erate) & (span_a >= self.min_span)

        # containment must be asymmetric: near-identical reads (same span,
        # both ends flush) would otherwise mark EACH OTHER contained and
        # both drop out of the graph — the container must be strictly
        # longer, ties broken by id (the reference resolves duplicate
        # reads similarly in gatekeeper dedup + bogart contain handling)
        a_longer = (len_a > len_b) | ((len_a == len_b) & (st.a_id < st.b_id))
        self.b_contained = ok & b_l0 & b_r0 & ~(a_l0 & a_r0 & ~a_longer) & a_longer
        self.a_contained = ok & a_l0 & a_r0 & ~a_longer  # A inside B
        # dovetail off A's 5' end: B' sticks out left
        self.dove5 = ok & a_l0 & b_r0 & ~b_l0 & ~a_r0
        # dovetail off A's 3' end: B' sticks out right
        self.dove3 = ok & a_r0 & b_l0 & ~b_r0 & ~a_l0
        self.score = np.where(ok, span_a * (1.0 - st.erate.astype(np.float64)), -1.0)
        self.bp_bgn, self.bp_end = bp_bgn, bp_end

    def _pick_best(self) -> None:
        st = self.store
        n = self.n
        best_b = np.zeros((n + 1, 2), np.int32)
        best_row = np.full((n + 1, 2), -1, np.int64)
        contained_in = np.zeros(n + 1, np.int32)
        contain_row = np.full(n + 1, -1, np.int64)
        contain_score = np.full(n + 1, -1.0)

        # contained reads: best container by score
        rows_c = np.flatnonzero(self.a_contained)
        for r in rows_c:
            a = st.a_id[r]
            if self.score[r] > contain_score[a]:
                contain_score[a] = self.score[r]
                contained_in[a] = st.b_id[r]
                contain_row[a] = r
        self.is_contained = contained_in > 0
        # a contained read never offers dovetail edges, and edges must not
        # point INTO contained reads (reference: best edges skip contains)
        tgt_contained = self.is_contained[st.b_id]

        for end, mask in ((END5, self.dove5), (END3, self.dove3)):
            rows = np.flatnonzero(mask & ~self.is_contained[st.a_id] & ~tgt_contained)
            if len(rows) == 0:
                continue
            sc = self.score[rows]
            order = np.argsort(sc, kind="stable")  # ascending; last wins
            rr = rows[order]
            best_b[st.a_id[rr], end] = st.b_id[rr]
            best_row[st.a_id[rr], end] = rr
        self.best = BestEdges(best_b, best_row, contained_in, contain_row)

    # which end of B does an edge (store row) enter?  Off A's `end`, the
    # alignment touches B' at the opposite side; in forward-B terms the
    # entry end flips again when the overlap is flipped.
    def entry_end(self, row: int, a_end: int) -> int:
        flipped = bool(self.store.flipped[row])
        # off A3' -> enter B'5'; off A5' -> enter B'3'
        ep = END5 if a_end == END3 else END3
        if flipped:
            ep = END5 if ep == END3 else END3
        return ep


def _mutual(bog: BestOverlapGraph, a: int, a_end: int) -> Optional[tuple[int, int, int]]:
    """Follow a's best edge; require the target's best edge back.

    Returns (b_id, b_entry_end, row) or None.
    """
    b = int(bog.best.b_id[a, a_end])
    if b == 0:
        return None
    row = int(bog.best.row[a, a_end])
    b_entry = bog.entry_end(row, a_end)
    if int(bog.best.b_id[b, b_entry]) != a:
        return None
    return b, b_entry, row


def build_unitigs(
    store: OverlapStore,
    read_lengths: np.ndarray,
    max_erate: float = 0.30,
    end_slop: int = 100,
    min_span: int = 500,
    min_reads_per_contig: int = 2,
) -> TigStore:
    """Greedy mutual-best unitigs + contained placement + singletons."""
    bog = BestOverlapGraph(store, read_lengths, max_erate, end_slop, min_span)
    n = store.n_reads
    visited = np.zeros(n + 1, bool)
    tigs = TigStore()
    tig_of_read = np.zeros(n + 1, np.int32)  # 1-based tig ids, 0 = none

    # seed longest reads first (proxy for the reference ChunkGraph's
    # mutual-best chain-length ordering)
    seed_order = np.argsort(-read_lengths, kind="stable") + 1

    def step(cur: int, cur_rev: bool, lo: int, hi: int, direction: int):
        """One walk step rightwards (direction=+1) or leftwards (-1).

        Returns (b, b_rev, lo_b, hi_b, row) or None.
        """
        # tig-right end of cur read: 3' if forward else 5' (mirror for left)
        if direction > 0:
            out = END3 if not cur_rev else END5
        else:
            out = END5 if not cur_rev else END3
        nxt = _mutual(bog, cur, out)
        if nxt is None:
            return None
        b, b_entry, row = nxt
        st = store
        len_b = int(read_lengths[b - 1])
        flipped = bool(st.flipped[row])
        a_bgn, a_end = int(st.a_bgn[row]), int(st.a_end[row])
        bp_bgn, bp_end = int(bog.bp_bgn[row]), int(bog.bp_end[row])
        b_rev = cur_rev ^ flipped
        if not cur_rev:
            pos0 = lo + a_bgn - bp_bgn  # tig pos of B' base 0
            lo_b, hi_b = pos0, pos0 + len_b
        else:
            # A-forward coordinate x sits at tig pos hi - x
            pos_end = hi - a_bgn + bp_bgn  # tig pos of B' base 0 (right side)
            lo_b, hi_b = pos_end - len_b, pos_end
        return b, b_rev, lo_b, hi_b, row

    next_tig_id = 1
    for seed in seed_order:
        seed = int(seed)
        if visited[seed] or bog.is_contained[seed]:
            continue
        placements: list[tuple[int, int, int, bool]] = []
        lo, hi = 0, int(read_lengths[seed - 1])
        placements.append((seed, lo, hi, False))
        visited[seed] = True
        # rightwards
        cur, cur_rev, clo, chi = seed, False, lo, hi
        while True:
            nxt = step(cur, cur_rev, clo, chi, +1)
            if nxt is None:
                break
            b, b_rev, lo_b, hi_b, _ = nxt
            if visited[b]:
                break
            placements.append((b, lo_b, hi_b, b_rev))
            visited[b] = True
            cur, cur_rev, clo, chi = b, b_rev, lo_b, hi_b
        # leftwards from the seed
        cur, cur_rev, clo, chi = seed, False, lo, hi
        while True:
            nxt = step(cur, cur_rev, clo, chi, -1)
            if nxt is None:
                break
            b, b_rev, lo_b, hi_b, _ = nxt
            if visited[b]:
                break
            placements.append((b, lo_b, hi_b, b_rev))
            visited[b] = True
            cur, cur_rev, clo, chi = b, b_rev, lo_b, hi_b

        rid = np.array([p[0] for p in placements], np.int32)
        bgn = np.array([p[1] for p in placements], np.int32)
        end = np.array([p[2] for p in placements], np.int32)
        rev = np.array([p[3] for p in placements], bool)
        shift = bgn.min()
        bgn -= shift
        end -= shift
        order = np.argsort(bgn, kind="stable")
        tig = Tig(next_tig_id, rid[order], bgn[order], end[order], rev[order])
        tigs.add(tig)
        tig_of_read[rid] = next_tig_id
        next_tig_id += 1

    # place contained reads into their container's tig (placeContains);
    # containers may themselves be contained, so iterate until settled,
    # resolving placements from a read->placement map (not tig arrays,
    # which are only rebuilt at the end)
    placement_of: dict[int, tuple[int, int, int, bool]] = {}  # read -> (tig, lo, hi, rev)
    for tig in tigs:
        for i in range(tig.n_reads):
            placement_of[int(tig.read_id[i])] = (
                tig.tig_id, int(tig.bgn[i]), int(tig.end[i]), bool(tig.rev[i])
            )
    placed_extra: dict[int, list[tuple[int, int, int, bool]]] = {}
    progressed = True
    while progressed:
        progressed = False
        for r in range(1, n + 1):
            if not bog.is_contained[r] or visited[r]:
                continue
            container = int(bog.best.contained_in[r])
            if container not in placement_of:
                continue
            t, c_lo, c_hi, c_rev = placement_of[container]
            row = int(bog.best.contain_row[r])
            # row has a_id == r contained in b_id == container
            st = store
            flipped = bool(st.flipped[row])
            # container-forward span of the alignment
            b_bgn, b_end = int(st.b_bgn[row]), int(st.b_end[row])
            if not c_rev:
                lo_r = c_lo + b_bgn
                hi_r = c_lo + b_end
            else:
                lo_r = c_hi - b_end
                hi_r = c_hi - b_bgn
            r_rev = c_rev ^ flipped
            placed_extra.setdefault(t, []).append((r, lo_r, hi_r, r_rev))
            placement_of[r] = (t, lo_r, hi_r, r_rev)
            visited[r] = True
            tig_of_read[r] = t
            progressed = True
    for t, extras in placed_extra.items():
        tig = tigs[t - 1]
        rid = np.concatenate([tig.read_id, np.array([e[0] for e in extras], np.int32)])
        bgn = np.concatenate([tig.bgn, np.array([e[1] for e in extras], np.int32)])
        end = np.concatenate([tig.end, np.array([e[2] for e in extras], np.int32)])
        rev = np.concatenate([tig.rev, np.array([e[3] for e in extras], bool)])
        shift = bgn.min()
        order = np.argsort(bgn, kind="stable")
        tigs.tigs[t - 1] = Tig(tig.tig_id, rid[order], (bgn - shift)[order], (end - shift)[order], rev[order])

    # leftovers -> singleton unassembled tigs
    for r in range(1, n + 1):
        if visited[r]:
            continue
        tig = Tig(
            next_tig_id,
            np.array([r], np.int32),
            np.array([0], np.int32),
            np.array([read_lengths[r - 1]], np.int32),
            np.array([False]),
            tig_class=CLASS_UNASSEMBLED,
        )
        tigs.add(tig)
        next_tig_id += 1

    # classify: contigs need min_reads_per_contig
    for tig in tigs:
        if tig.tig_class == CLASS_CONTIG and tig.n_reads < min_reads_per_contig:
            tig.tig_class = CLASS_UNASSEMBLED

    # orphan merge + bubble classification (bogart mergeOrphans,
    # bogart.C:469-478) — moves fully-placeable small tigs into their
    # targets, marks partially-placeable ones CLASS_BUBBLE
    from .orphans import merge_orphans

    tigs, _, _ = merge_orphans(tigs, store, read_lengths)
    return tigs
