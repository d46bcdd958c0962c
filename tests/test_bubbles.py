import numpy as np

from canu_tpu.graph.best_overlap import _mark_bubbles
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


def test_mark_bubbles():
    # tig 1: reads 1..6 (big); tig 2: reads 7,8 (small, both overlap tig 1)
    big = _tig(1, [1, 2, 3, 4, 5, 6], 6000)
    small = _tig(2, [7, 8], 1800)
    lone = _tig(3, [9, 10], 1800)  # no cross-overlaps -> stays contig
    tigs = TigStore([big, small, lone])
    tig_of_read = np.array([0, 1, 1, 1, 1, 1, 1, 2, 2, 3, 3], np.int32)
    table = OverlapTable(
        a_id=np.array([7, 8], np.int32),
        b_id=np.array([2, 3], np.int32),
        flipped=np.zeros(2, bool),
        a_bgn=np.zeros(2, np.int32),
        a_end=np.full(2, 900, np.int32),
        b_bgn=np.zeros(2, np.int32),
        b_end=np.full(2, 900, np.int32),
        erate_q=np.full(2, 100, np.uint16),
    )
    store = OverlapStore.build(table, 10)
    _mark_bubbles(tigs, store, tig_of_read)
    assert tigs[0].tig_class == CLASS_CONTIG
    assert tigs[1].tig_class == CLASS_BUBBLE
    assert tigs[2].tig_class == CLASS_CONTIG
