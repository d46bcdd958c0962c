import numpy as np
import jax.numpy as jnp

from canu_tpu.ops import kmer as K
from canu_tpu.sim.simulate import random_genome, simulate_reads
from canu_tpu.stores.readset import ReadSet


def test_device_counts_match_host_path():
    g = random_genome(5000, seed=9)
    rs, _ = simulate_reads(g, coverage=4, mean_len=800, min_len=200, error_rate=0.08, seed=2)
    dkc = K.count_readset_device(rs, k=13, block_size=8)
    host = dkc.to_host()
    # brute force reference
    from collections import Counter
    from tests.test_kmer import brute_canonical_kmers

    cnt = Counter()
    for rid in range(1, rs.n_reads + 1):
        cnt.update(brute_canonical_kmers(rs.get_seq(rid), 13))
    assert host.n_distinct == len(cnt)
    assert host.n_total == sum(cnt.values())
    assert dkc.n_distinct() == len(cnt)
    assert dkc.n_total() == sum(cnt.values())
    expect = np.array(sorted(cnt.keys()), dtype=np.uint32)
    np.testing.assert_array_equal(host.unique, expect)


def test_device_histogram_matches_host():
    g = random_genome(4000, seed=1)
    rs, _ = simulate_reads(g, coverage=6, mean_len=700, min_len=200, error_rate=0.05, seed=5)
    dkc = K.count_readset_device(rs, k=12, block_size=16)
    host = dkc.to_host()
    dh = dkc.histogram(100)
    hh = host.histogram(max_count=100)
    np.testing.assert_array_equal(dh[1 : len(hh)], hh[1:])


def test_device_frequent_selection():
    # reads made of a repeated motif so some kmers are very frequent
    motif = "ACGTTGCAGGTACCTA"  # 16bp
    rs = ReadSet.from_sequences([motif * 50, motif * 30, "TGCA" * 100])
    dkc = K.count_readset_device(rs, k=8, block_size=4)
    host = dkc.to_host()
    thr = 10
    fk_dev = dkc.frequent(thr)
    fk_host = K.frequent_kmers(host, threshold=thr)
    np.testing.assert_array_equal(fk_dev.kmers, fk_host.kmers)
    np.testing.assert_allclose(fk_dev.fraction, fk_host.fraction, rtol=1e-5)
    assert fk_dev.n > 0


def test_empty_readset_device():
    rs = ReadSet.from_sequences([])
    dkc = K.count_readset_device(rs, k=16)
    assert dkc.n_distinct() == 0
    assert dkc.to_host().n_distinct == 0
