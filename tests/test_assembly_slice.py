"""End-to-end slice: simulated reads -> overlaps -> store -> unitigs -> mosaic.

The truth-based validation style of the reference's bogus/bogusness
harness (/root/reference/src/bogus/) — assembled contigs are compared
against the known simulated genome.
"""

import pytest
import numpy as np
import jax.numpy as jnp

from canu_tpu.ops import kmer as K, minhash as MH, align as AL
from canu_tpu.ops.consensus import quick_mosaic
from canu_tpu.graph import build_unitigs
from canu_tpu.stores.overlaps import OverlapStore
from canu_tpu.stores.tigs import CLASS_CONTIG, TigStore
from canu_tpu.sim.simulate import random_genome, simulate_reads
from canu_tpu.utils import bitpack


def compute_overlaps(rs, n_hashes=512, band=128, max_erate=0.35, min_overlap=500):
    kc = K.count_readset_device(rs, k=16, block_size=64)
    fk = K.frequent_kmers(kc, distinct_fraction=0.9995)
    sk = MH.build_sketches(rs, k=16, n_hashes=n_hashes, frequent=fk, block_size=64)
    pairs = MH.find_candidates(sk, min_matches=2, block_size=64)
    cand = MH.place_candidates(rs, pairs, k=16, frequent=fk, min_shared=4, chunk=64)
    return AL.verify_overlaps(rs, cand, band=band, max_erate=max_erate, min_overlap=min_overlap, chunk=64)


def identity_vs_genome(contig_codes, genome):
    """Align contig against genome (both orientations) with our own DP."""
    from canu_tpu.ops.align import banded_extend

    best = None
    for cand in (contig_codes, bitpack.revcomp_codes(contig_codes)):
        # find offset via exact 32-mer match
        g_str = bitpack.codes_to_seq(genome)
        for probe_at in range(0, max(1, len(cand) - 32), 200):
            probe = bitpack.codes_to_seq(cand[probe_at : probe_at + 32])
            off = g_str.find(probe)
            if off >= 0:
                a = cand[probe_at:]
                b = genome[off:]
                la, lb = len(a), len(b)
                n_rows = la
                band = 512
                L = max(la, lb) + band
                aa = np.zeros((1, L), np.uint8); aa[0, :la] = a
                bb = np.zeros((1, L), np.uint8); bb[0, :lb] = b
                c = np.round(np.linspace(0, min(lb, la), n_rows + 1)).astype(np.int32).reshape(1, -1)
                e, au, bu = banded_extend(
                    jnp.asarray(aa), jnp.asarray(np.array([la], np.int32)),
                    jnp.asarray(bb), jnp.asarray(np.array([lb], np.int32)),
                    jnp.asarray(c), band, n_rows,
                )
                ident = 1.0 - float(e[0]) / max(1, int(au[0]))
                if best is None or ident > best:
                    best = ident
                break
        if best is not None and best > 0.99:
            break
    return best if best is not None else 0.0


@pytest.mark.slow
def test_slice_zero_error():
    g = random_genome(15_000, seed=30)
    rs, truth = simulate_reads(
        g, coverage=10, mean_len=1800, min_len=900, error_rate=0.0, seed=31, circular=False
    )
    ov = compute_overlaps(rs, max_erate=0.10)
    store = OverlapStore.build(ov, rs.n_reads)
    assert store.n_overlaps == len(ov)
    # symmetry: every A->B row has a B->A row
    r = store.overlaps_for(int(store.a_id[0]))
    assert len(r["a_id"]) >= 1
    tigs = build_unitigs(store, rs.length, max_erate=0.10)
    contigs = [t for t in tigs if t.tig_class == CLASS_CONTIG]
    assert len(contigs) >= 1
    big = max(contigs, key=lambda t: t.length)
    # the biggest contig should cover most of the genome
    assert big.length > 0.8 * len(g), big.length
    cns = quick_mosaic(rs, big)
    ident = identity_vs_genome(cns, g)
    assert ident >= 0.999, ident


@pytest.mark.slow
def test_slice_noisy():
    g = random_genome(15_000, seed=32)
    rs, truth = simulate_reads(
        g, coverage=12, mean_len=1800, min_len=900, error_rate=0.05, seed=33, circular=False
    )
    ov = compute_overlaps(rs, max_erate=0.25)
    store = OverlapStore.build(ov, rs.n_reads)
    tigs = build_unitigs(store, rs.length, max_erate=0.25)
    contigs = [t for t in tigs if t.tig_class == CLASS_CONTIG]
    assert contigs
    big = max(contigs, key=lambda t: t.length)
    assert big.length > 0.7 * len(g), big.length
    cns = quick_mosaic(rs, big)
    ident = identity_vs_genome(cns, g)
    # mosaic consensus carries read-level error (~5%)
    assert ident >= 0.90, ident


@pytest.mark.slow
def test_store_roundtrip(tmp_path):
    g = random_genome(6000, seed=34)
    rs, _ = simulate_reads(g, coverage=6, mean_len=1500, min_len=800, error_rate=0.02, seed=35, circular=False)
    ov = compute_overlaps(rs, max_erate=0.2)
    store = OverlapStore.build(ov, rs.n_reads)
    store.save(tmp_path / "ovl")
    st2 = OverlapStore.load(tmp_path / "ovl")
    assert len(st2) == len(store)
    np.testing.assert_array_equal(st2.a_id, store.a_id)
    np.testing.assert_array_equal(st2.erate_q, store.erate_q)
    # update_erates (OEA sidecar)
    new = store.erate_q.copy()
    new[:] = np.minimum(new, 100)
    st2.update_erates(new)
    assert st2.erate_q.max() <= 100


def test_tigstore_roundtrip(tmp_path):
    from canu_tpu.stores.tigs import Tig

    t = Tig(
        1,
        np.array([3, 1], np.int32),
        np.array([0, 500], np.int32),
        np.array([2000, 2500], np.int32),
        np.array([False, True]),
        consensus=np.array([0, 1, 2, 3], np.uint8),
    )
    ts = TigStore([t])
    ts.save(tmp_path / "tigs", version=2)
    assert TigStore.latest_version(tmp_path / "tigs") == 2
    ts2 = TigStore.load(tmp_path / "tigs", version=2)
    assert len(ts2) == 1
    np.testing.assert_array_equal(ts2[0].read_id, [3, 1])
    np.testing.assert_array_equal(ts2[0].consensus, [0, 1, 2, 3])
    assert ts2[0].rev[1]
