"""Host k-mer counter (the beyond-HBM meryl path) vs the device counter."""

import numpy as np

from canu_tpu.ops import kmer as K
from canu_tpu.sim.simulate import random_genome, simulate_reads


def _readset():
    g = random_genome(20_000, seed=50)
    rs, _ = simulate_reads(
        g, coverage=6, mean_len=1800, min_len=900, max_len=3000,
        error_rate=0.05, seed=51, circular=False,
    )
    return rs


def test_host_counter_matches_device_k16():
    rs = _readset()
    dev = K.count_readset_device(rs, k=16, block_size=64).to_host()
    host = K.count_readset_host(rs, k=16)
    assert np.array_equal(dev.unique, host.unique)
    assert np.array_equal(dev.counts, host.counts)


def test_host_counter_matches_device_k22():
    rs = _readset()
    dev = K.count_readset_device(rs, k=22, block_size=64).to_host()
    host = K.count_readset_host(rs, k=22)
    assert np.array_equal(dev.unique, host.unique)
    assert np.array_equal(dev.counts, host.counts)


def test_budget_switch_engages_host_path():
    """Above the instance budget count_readset_device returns the host
    KmerCounts; thresholds + frequent tables work identically."""
    rs = _readset()
    kc = K.count_readset_device(rs, k=22, max_instances=1000)
    assert isinstance(kc, K.KmerCounts)
    thr = K.threshold_from_distinct_fraction(kc, 0.9995)
    fk = K.frequent_kmers(kc, threshold=thr)
    dev = K.count_readset_device(rs, k=22, block_size=64)
    fk_dev = dev.frequent(int(thr))
    assert np.array_equal(np.sort(fk.kmers), np.sort(fk_dev.kmers))
