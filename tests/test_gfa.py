"""GFA output + alignGFA-equivalent edge verification."""

import pytest
import numpy as np

from canu_tpu.io.gfa import align_links, write_gfa
from canu_tpu.stores.tigs import Tig, TigStore
from canu_tpu.utils import bitpack


def _tig(tid, cns):
    n = 3
    L = len(cns)
    bgn = np.linspace(0, L - 100, n).astype(np.int32)
    return Tig(tid, (np.arange(1, n + 1) + 10 * tid).astype(np.int32), bgn,
               bgn + 100, np.zeros(n, bool), consensus=cns)


@pytest.mark.slow
def test_align_links_confirms_true_edge_and_drops_fake():
    rng = np.random.default_rng(5)
    whole = rng.integers(0, 4, size=3000).astype(np.uint8)
    # tig1 = first 1800, tig2 = last 1800 -> true 600bp suffix/prefix overlap
    t1 = _tig(1, whole[:1800])
    t2 = _tig(2, whole[1200:])
    t3 = _tig(3, rng.integers(0, 4, size=1500).astype(np.uint8))  # unrelated
    tigs = TigStore([t1, t2, t3])
    links = [(1, "+", 2, "+", 600), (1, "+", 3, "+", 600)]
    out = align_links(tigs, links, max_erate=0.1)
    kept = {(ta, tb) for ta, _, tb, _, _, _ in out}
    assert (1, 2) in kept and (1, 3) not in kept
    ln = [l for l in out if l[0] == 1 and l[2] == 2][0][4]
    assert abs(ln - 600) < 60, ln
    er = [l for l in out if l[0] == 1 and l[2] == 2][0][5]
    assert er < 0.02


@pytest.mark.slow
def test_align_links_reverse_orientation():
    rng = np.random.default_rng(6)
    whole = rng.integers(0, 4, size=2400).astype(np.uint8)
    t1 = _tig(1, whole[:1500])
    # tig2 holds the rc of the tail: link must align with ob='-'
    t2 = _tig(2, bitpack.revcomp_codes(whole[900:]))
    tigs = TigStore([t1, t2])
    out = align_links(tigs, [(1, "+", 2, "-", 600)], max_erate=0.1)
    assert out and out[0][4] > 500


def test_write_gfa_verified(tmp_path):
    rng = np.random.default_rng(7)
    whole = rng.integers(0, 4, size=3000).astype(np.uint8)
    t1 = _tig(1, whole[:1800])
    t2 = _tig(2, whole[1200:])
    tigs = TigStore([t1, t2])

    class RS:  # unused by write_gfa when store is None
        pass

    p = str(tmp_path / "g.gfa")
    n = write_gfa(p, tigs, RS(), store=None, verify_edges=True)
    assert n == 2
    lines = open(p).read().splitlines()
    assert lines[0].startswith("H")
    assert sum(1 for l in lines if l.startswith("S")) == 2
