"""RED/OEA overlap error adjustment (findErrors/correctOverlaps)."""

import pytest
import numpy as np

from canu_tpu.ops.align import verify_overlaps
from canu_tpu.ops.oea import adjust_overlap_erates, apply_corrections, detect_read_errors
from canu_tpu.sim.simulate import random_genome
from canu_tpu.stores.overlaps import OverlapStore
from canu_tpu.stores.readset import ReadSet
from canu_tpu.utils import bitpack


def _make_pile(seed=0, n=10, L=2000, err_pos=None):
    """n reads sampling the same genome window, exact except read 1 gets
    planted substitution errors at err_pos."""
    g = random_genome(4000, seed=seed)
    codes = []
    spans = []
    rng = np.random.default_rng(seed + 1)
    for i in range(n):
        s = int(rng.integers(0, 500))
        e = s + L
        c = g[s:e].copy()
        codes.append(c)
        spans.append((s, e))
    if err_pos:
        for p in err_pos:
            codes[0][p] = (codes[0][p] + 1) % 4
    rs = ReadSet.from_codes_list(codes, [f"r{i+1}" for i in range(n)])
    return rs, g, spans


@pytest.mark.slow
def test_red_finds_planted_errors():
    err_pos = [200, 900, 1500]
    rs, g, spans = _make_pile(err_pos=err_pos)
    pairs = np.array(
        [(1, b) for b in range(2, 11)] + [(a, b) for a in range(2, 10) for b in range(a + 1, 11)],
        np.int64,
    )
    ov = verify_overlaps(rs, pairs, band=128, max_erate=0.2, min_overlap=500, chunk=32)
    st = OverlapStore.build(ov, rs.n_reads)
    corr = detect_read_errors(rs, st, band=128)
    assert 1 in corr, "read 1 must get corrections"
    fixed_pos = set(corr[1][:, 0].tolist())
    # planted error positions are template coordinates of read 1
    found = sum(1 for p in err_pos if any(abs(p - q) <= 1 for q in fixed_pos))
    assert found >= 2, (err_pos, sorted(fixed_pos))
    # corrections restore the original base
    fixed = apply_corrections(rs, corr)
    c0 = fixed.get_codes(1)
    orig, _, _ = _make_pile(err_pos=None)
    hits = sum(int(c0[p] == orig.get_codes(1)[p]) for p in err_pos)
    assert hits >= 2


@pytest.mark.slow
def test_oea_lowers_erates():
    err_pos = list(range(100, 1900, 50))  # 36 errors ~ 1.8% erate on read 1
    rs, g, spans = _make_pile(err_pos=err_pos)
    pairs = np.array(
        [(1, b) for b in range(2, 11)] + [(a, b) for a in range(2, 10) for b in range(a + 1, 11)],
        np.int64,
    )
    ov = verify_overlaps(rs, pairs, band=128, max_erate=0.2, min_overlap=500, chunk=32)
    st = OverlapStore.build(ov, rs.n_reads)
    rows_read1 = (st.a_id == 1) | (st.b_id == 1)
    before = st.erate[rows_read1].mean()
    assert before > 0.005, "planted errors must show in erates"
    corr = detect_read_errors(rs, st, band=128)
    new_q = adjust_overlap_erates(rs, st, corr, band=128, chunk=32)
    st.update_erates(new_q)
    after = st.erate[rows_read1].mean()
    assert after < before * 0.5, (before, after)


@pytest.mark.slow
def test_oea_only_changed_differential():
    """only_changed=True must (a) give IDENTICAL adjusted erates on every
    overlap touching a corrected read, and (b) keep the stored erate on
    overlaps between untouched reads (reference Redo_Olaps on affected
    frags, correctOverlaps.C:156-178)."""
    err_pos = [200, 900, 1500]
    rs, g, spans = _make_pile(err_pos=err_pos)
    pairs = np.array(
        [(1, b) for b in range(2, 11)]
        + [(a, b) for a in range(2, 10) for b in range(a + 1, 11)],
        np.int64,
    )
    ov = verify_overlaps(rs, pairs, band=128, max_erate=0.2,
                         min_overlap=500, chunk=32)
    st = OverlapStore.build(ov, rs.n_reads)
    corr = detect_read_errors(rs, st, band=128)
    assert corr, "need at least one corrected read"
    full = adjust_overlap_erates(rs, st, corr, band=128, chunk=32)
    fast = adjust_overlap_erates(rs, st, corr, band=128, chunk=32,
                                 only_changed=True)
    changed = np.zeros(st.n_reads + 1, bool)
    for rid in corr:
        changed[rid] = True
    touched = changed[st.a_id] | changed[st.b_id]
    np.testing.assert_array_equal(fast[touched], full[touched])
    np.testing.assert_array_equal(fast[~touched], st.erate_q[~touched])


def test_oea_only_changed_no_corrections():
    """Zero corrections -> only_changed returns the stored erates
    without any device dispatch."""
    rs, g, spans = _make_pile(err_pos=None)
    pairs = np.array([(a, b) for a in range(1, 10)
                      for b in range(a + 1, 11)], np.int64)
    ov = verify_overlaps(rs, pairs, band=128, max_erate=0.2,
                         min_overlap=500, chunk=32)
    st = OverlapStore.build(ov, rs.n_reads)
    out = adjust_overlap_erates(rs, st, {}, band=128, chunk=32,
                                only_changed=True)
    np.testing.assert_array_equal(out, st.erate_q)
