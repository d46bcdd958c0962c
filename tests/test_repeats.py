"""Repeat detection + tig splitting (bogart markRepeatReads /
splitDiscontinuous equivalents, reference bogart.C:498-560)."""

import numpy as np

from canu_tpu.graph.repeats import (
    find_repeat_regions,
    mark_repeats,
    split_discontinuous,
    tig_read_index,
)
from canu_tpu.ops.align import OverlapTable
from canu_tpu.stores.overlaps import OverlapStore
from canu_tpu.stores.tigs import CLASS_CONTIG, CLASS_UNASSEMBLED, Tig, TigStore


def _tiling_tig(tid, first_read, n, step=500, rlen=1000):
    bgn = np.arange(n, dtype=np.int32) * step
    return Tig(
        tid,
        np.arange(first_read, first_read + n, dtype=np.int32),
        bgn,
        bgn + rlen,
        np.zeros(n, bool),
    )


def _store(rows, n_reads):
    table = OverlapTable(
        a_id=np.array([r[0] for r in rows], np.int32),
        b_id=np.array([r[1] for r in rows], np.int32),
        flipped=np.array([r[2] for r in rows], bool),
        a_bgn=np.array([r[3] for r in rows], np.int32),
        a_end=np.array([r[4] for r in rows], np.int32),
        b_bgn=np.array([r[5] for r in rows], np.int32),
        b_end=np.array([r[6] for r in rows], np.int32),
        erate_q=np.array([r[7] for r in rows], np.uint16),
    )
    return OverlapStore.build(table, n_reads)


def _two_tig_setup():
    """Tig 1 (reads 1..10 tiling 0..5500) + tig 2 (reads 11..16).

    Internal dovetail overlaps along each tig; reads 12,13 of tig 2 also
    align to reads 5,6 of tig 1 (a repeat in the middle of tig 1).
    """
    t1 = _tiling_tig(1, 1, 10)
    t2 = _tiling_tig(2, 11, 6)
    rows = []
    for a in range(1, 10):
        rows.append((a, a + 1, False, 500, 1000, 0, 500, 200))
    for a in range(11, 16):
        rows.append((a, a + 1, False, 500, 1000, 0, 500, 200))
    # external evidence: full-read alignments (score 1000 > internal 500)
    rows.append((5, 12, False, 0, 1000, 0, 1000, 200))
    rows.append((6, 13, False, 0, 1000, 0, 1000, 200))
    # boundary reads 4 and 7 get external edges too (confusion)
    rows.append((4, 11, False, 0, 1000, 0, 1000, 200))
    rows.append((7, 14, False, 0, 1000, 0, 1000, 200))
    return TigStore([t1, t2]), _store(rows, 16)


def test_find_repeat_regions():
    tigs, store = _two_tig_setup()
    read_len = np.full(16, 1000, np.int32)
    tig_of, *_ = tig_read_index(tigs, 16)
    regions = find_repeat_regions(tigs[0], store, tig_of, min_evidence=2)
    assert regions, "external evidence must produce a repeat region"
    # reads 4..7 project to tig coords 1500..4000 (one merged region)
    reg = max(regions, key=lambda r: r.n_evidence)
    assert reg.n_evidence >= 2
    assert reg.bgn >= 1000 and reg.end <= 4500


def test_mark_repeats_breaks_confused_tig():
    tigs, store = _two_tig_setup()
    read_len = np.full(16, 1000, np.int32)
    out, regions = mark_repeats(tigs, store, read_len, min_evidence=2)
    assert any(r.broke for r in regions), "confused boundaries must break"
    # tig 1 must be split: no output tig contains both read 1 and read 10
    for t in out:
        ids = set(t.read_id.tolist())
        assert not ({1, 10} <= ids), "misjoin across the repeat survived"
    # every read is still somewhere
    all_ids = sorted(i for t in out for i in t.read_id.tolist())
    assert all_ids == list(range(1, 17))


def test_mark_repeats_no_break_without_confusion():
    # same layout but boundary reads 4/7 have NO external edges and the
    # confusion thresholds are strict -> regions found, no breaks
    t1 = _tiling_tig(1, 1, 10)
    t2 = _tiling_tig(2, 11, 6)
    rows = []
    for a in range(1, 10):
        rows.append((a, a + 1, False, 0, 1000, 0, 1000, 200))  # strong internal
    for a in range(11, 16):
        rows.append((a, a + 1, False, 500, 1000, 0, 500, 200))
    rows.append((5, 12, False, 900, 1000, 0, 100, 200))  # weak external
    rows.append((6, 13, False, 900, 1000, 0, 100, 200))
    tigs = TigStore([t1, t2])
    store = _store(rows, 16)
    read_len = np.full(16, 1000, np.int32)
    out, regions = mark_repeats(
        tigs, store, read_len, min_evidence=2,
        confused_absolute=50.0, confused_percent=5.0,
    )
    assert not any(r.broke for r in regions)
    assert len(out) == 2


def test_split_discontinuous():
    # one tig with a coverage gap between read 3 and read 4
    bgn = np.array([0, 500, 1000, 3000, 3500], np.int32)
    end = bgn + 1000
    tig = Tig(1, np.arange(1, 6, dtype=np.int32), bgn, end, np.zeros(5, bool))
    out = split_discontinuous(TigStore([tig]))
    assert len(out) == 2
    assert out[0].read_id.tolist() == [1, 2, 3]
    assert out[1].read_id.tolist() == [4, 5]
    # second piece re-based to 0
    assert int(out[1].bgn.min()) == 0
    assert out[0].tig_class == CLASS_CONTIG


def test_split_discontinuous_singleton_class():
    bgn = np.array([0, 2000], np.int32)
    tig = Tig(1, np.array([1, 2], np.int32), bgn, bgn + 1000, np.zeros(2, bool))
    out = split_discontinuous(TigStore([tig]), min_reads_per_contig=2)
    assert len(out) == 2
    assert all(t.tig_class == CLASS_UNASSEMBLED for t in out)


def test_optimize_positions_recovers_offsets():
    """Perturbed tig positions move back to overlap-implied coordinates
    (AS_BAT_OptimizePositions.C role)."""
    import numpy as np

    from canu_tpu.graph.best_overlap import optimize_positions
    from canu_tpu.stores.tigs import Tig, TigStore

    # 4 reads of 1000, true spacing 600 (400 bp dovetails), positions
    # perturbed by up to +-120
    true_bgn = np.array([0, 600, 1200, 1800])
    pert = np.array([0, 110, -120, 90])
    L = 1000
    tigs = TigStore()
    tigs.add(Tig(1, np.arange(1, 5, dtype=np.int32),
                 (true_bgn + pert).astype(np.int32),
                 (true_bgn + pert + L).astype(np.int32),
                 np.zeros(4, bool)))
    rows = []
    for i in range(3):  # overlaps i <-> i+1: a[600:1000] ~ b[0:400]
        rows.append((i + 1, i + 2, False, 600, 1000, 0, 400, 100))
        rows.append((i + 2, i + 1, False, 0, 400, 600, 1000, 100))
    st = _store(rows, 4)
    out = optimize_positions(tigs, st, np.full(4, L, np.int64), rounds=30)
    got = out[0].bgn.astype(np.int64)
    got = got - got.min()
    # relative spacing recovered to within a few bases
    assert np.abs(np.diff(got) - 600).max() <= 15, got
