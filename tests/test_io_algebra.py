"""meryl DB algebra, PAF/text overlap interchange, error estimation."""

import numpy as np

from canu_tpu.io.overlaps_io import (
    name_index,
    paf_to_table,
    random_overlaps,
    read_table_text,
    write_table_text,
)
from canu_tpu.ops.errorest import estimate_error_rates
from canu_tpu.ops.kmer import KmerCounts
from canu_tpu.stores.overlaps import OverlapStore


def _kc(pairs):
    u = np.array([p[0] for p in pairs], np.uint32)
    c = np.array([p[1] for p in pairs], np.int64)
    order = np.argsort(u)
    return KmerCounts(16, u[order], c[order])


def test_kmer_algebra():
    a = _kc([(1, 3), (2, 1), (5, 7)])
    b = _kc([(2, 4), (5, 2), (9, 1)])
    assert a.union_sum(b).counts.tolist() == [3, 5, 9, 1]
    um = a.union_min(b)
    assert um.unique.tolist() == [1, 2, 5, 9]
    assert um.counts.tolist() == [3, 1, 2, 1]
    ux = a.union_max(b)
    assert ux.counts.tolist() == [3, 4, 7, 1]
    im = a.intersect_min(b)
    assert im.unique.tolist() == [2, 5]
    assert im.counts.tolist() == [1, 2]
    assert a.intersect_max(b).counts.tolist() == [4, 7]
    assert a.intersect_sum(b).counts.tolist() == [5, 9]
    sub = a.subtract(b)
    assert sub.unique.tolist() == [1, 5]
    assert sub.counts.tolist() == [3, 5]
    diff = a.difference(b)
    assert diff.unique.tolist() == [1]
    assert a.at_least(3).unique.tolist() == [1, 5]
    assert a.at_most(1).unique.tolist() == [2]


def test_paf_import():
    lines = [
        "r1\t5000\t100\t4900\t+\tr2\t6000\t0\t4800\t4500\t4800\t60",
        "r2\t6000\t0\t3000\t-\tr3\t4000\t1000\t4000\t2700\t3000\t60",
        "rX\t100\t0\t100\t+\tr1\t5000\t0\t100\t90\t100\t60",  # unknown name
        "r1\t5000\t0\t200\t+\tr2\t6000\t0\t200\t190\t200\t60",  # short
    ]
    t = paf_to_table(lines, {"r1": 1, "r2": 2, "r3": 3}, min_overlap=500)
    assert len(t) == 2
    assert t.a_id.tolist() == [1, 2]
    assert t.flipped.tolist() == [False, True]
    assert abs(t.erate[0] - (1 - 4500 / 4800)) < 1e-3
    # drops into the normal store build
    st = OverlapStore.build(t, 3)
    assert st.n_overlaps == 2


def test_text_roundtrip(tmp_path):
    t = random_overlaps(50, n_reads=10, seed=3)
    p = str(tmp_path / "ovl.tsv")
    assert write_table_text(p, t) == 50
    t2 = read_table_text(p)
    assert t2.a_id.tolist() == t.a_id.tolist()
    assert t2.b_end.tolist() == t.b_end.tolist()
    assert np.abs(t2.erate_q.astype(int) - t.erate_q.astype(int)).max() <= 1


def test_random_overlaps_store_build():
    # parallel-ovl-store-test equivalent: store build from fake overlaps
    t = random_overlaps(10_000, n_reads=500, seed=1)
    st = OverlapStore.build(t, 500)
    assert st.n_overlaps == 10_000
    # per-read index is consistent
    per = st.n_overlaps_per_read()
    assert per.sum() == 20_000
    rid = int(st.a_id[1234])
    s, e = st.row_range(rid)
    assert (st.a_id[s:e] == rid).all()
    assert (np.diff(st.b_id[s:e]) >= 0).all()


def test_name_index():
    class RS:
        names = ["a", "b"]
        n_reads = 2

    assert name_index(RS()) == {"a": 1, "b": 2}


def test_error_estimate():
    rng = np.random.default_rng(0)
    # two 10%-error reads -> ~0.18 overlap erate
    er = np.clip(rng.normal(0.18, 0.02, size=5000), 0, 0.5)
    est = estimate_error_rates(er)
    assert 0.08 < est.read_error < 0.13
    assert est.suggested_ovl_erate > est.p95_erate
    assert est.n_sampled == 5000
    empty = estimate_error_rates(np.zeros(0))
    assert empty.n_sampled == 0
