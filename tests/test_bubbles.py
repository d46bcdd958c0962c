"""merge_orphans: orphan read re-placement + bubble classification
(reference bogart mergeOrphans, AS_BAT_MergeOrphans.C)."""

import numpy as np

from canu_tpu.graph.orphans import merge_orphans
from canu_tpu.ops.align import OverlapTable
from canu_tpu.stores.overlaps import OverlapStore
from canu_tpu.stores.tigs import CLASS_BUBBLE, CLASS_CONTIG, Tig, TigStore


def _tig(tid, reads, length):
    n = len(reads)
    return Tig(
        tid,
        np.array(reads, np.int32),
        np.linspace(0, length - 1000, n).astype(np.int32),
        (np.linspace(0, length - 1000, n) + 1000).astype(np.int32),
        np.zeros(n, bool),
    )


def _store(rows, n_reads):
    cols = {k: [] for k in ("a_id", "b_id", "flipped", "a_bgn", "a_end", "b_bgn", "b_end", "erate_q")}
    for r in rows:
        for k, v in zip(cols, r):
            cols[k].append(v)
    table = OverlapTable(
        a_id=np.array(cols["a_id"], np.int32),
        b_id=np.array(cols["b_id"], np.int32),
        flipped=np.array(cols["flipped"], bool),
        a_bgn=np.array(cols["a_bgn"], np.int32),
        a_end=np.array(cols["a_end"], np.int32),
        b_bgn=np.array(cols["b_bgn"], np.int32),
        b_end=np.array(cols["b_end"], np.int32),
        erate_q=np.array(cols["erate_q"], np.uint16),
    )
    return OverlapStore.build(table, n_reads)


def test_orphan_merged_into_target():
    # tig 1: reads 1..6 over 6000bp; tig 2: reads 7,8 (900bp each), both
    # placeable into tig 1 -> orphan: tig 2 disappears, reads move
    big = _tig(1, [1, 2, 3, 4, 5, 6], 6000)
    small = _tig(2, [7, 8], 1800)
    tigs = TigStore([big, small])
    read_len = np.array([1000] * 6 + [900, 900], np.int32)
    # read 7 aligns fully onto read 2 (placed at bgn=1000), read 8 onto read 3
    store = _store(
        [
            (7, 2, False, 0, 900, 50, 950, 100),
            (8, 3, False, 0, 900, 100, 1000, 100),
        ],
        8,
    )
    out, n_orphan, n_bubble = merge_orphans(tigs, store, read_len)
    assert n_orphan == 1 and n_bubble == 0
    assert len(out) == 1
    t = out[0]
    assert set(t.read_id.tolist()) == {1, 2, 3, 4, 5, 6, 7, 8}
    # read 7 projected: read 2 at (1000,2000) fwd; y=[50-0, 50+900] -> tig (1050,1950)
    i = list(t.read_id).index(7)
    assert (int(t.bgn[i]), int(t.end[i])) == (1050, 1950)
    assert not t.rev[i]


def test_partial_placement_marks_bubble():
    big = _tig(1, [1, 2, 3, 4, 5, 6], 6000)
    small = _tig(2, [7, 8], 1800)
    tigs = TigStore([big, small])
    read_len = np.array([1000] * 6 + [900, 900], np.int32)
    # only read 7 overlaps the big tig; read 8 has no overlaps at all
    store = _store([(7, 2, False, 0, 900, 50, 950, 100)], 8)
    out, n_orphan, n_bubble = merge_orphans(
        tigs, store, read_len, place_fraction_bubble=0.5
    )
    assert n_orphan == 0 and n_bubble == 1
    assert len(out) == 2
    assert out[1].tig_class == CLASS_BUBBLE
    assert out[0].tig_class == CLASS_CONTIG


def test_reverse_strand_projection():
    # target read 2 is REVERSED in the tig; overlap is flipped -> the
    # orphan read comes out forward, placed through two reflections
    big = Tig(
        1,
        np.array([1, 2, 3], np.int32),
        np.array([0, 1000, 2000], np.int32),
        np.array([1000, 2000, 3000], np.int32),
        np.array([False, True, False]),
    )
    small = _tig(2, [4], 900)
    small.read_id = np.array([4], np.int32)
    tigs = TigStore([big, small])
    read_len = np.array([1000, 1000, 1000, 900], np.int32)
    # read 4 vs read 2: flipped overlap covering read 4 fully, b span (100, 1000)
    store = _store([(4, 2, True, 0, 900, 100, 1000, 100)], 4)
    out, n_orphan, _ = merge_orphans(tigs, store, read_len, place_fraction_bubble=0.5)
    assert n_orphan == 1
    t = out[0]
    i = list(t.read_id).index(4)
    # y (b-forward) = [b_end + a_bgn - L, b_end + a_bgn] = [100, 1000];
    # tig (rev b at 1000..2000): [2000-1000, 2000-100] = (1000, 1900)
    assert (int(t.bgn[i]), int(t.end[i])) == (1000, 1900)
    # rev_b XOR flipped = True XOR True = False
    assert not t.rev[i]
