"""Distributed overlap-store sort on the virtual 8-device mesh
(ovStoreBucketizer/Sorter/Indexer equivalent: all_to_all + device sort)."""

import numpy as np

from canu_tpu.io.overlaps_io import random_overlaps
from canu_tpu.parallel.launch import all_host_shards, host_read_shard
from canu_tpu.parallel.storesort import distributed_store_sort, make_flat_mesh


def test_distributed_sort_matches_lexsort():
    t = random_overlaps(5000, n_reads=400, seed=9)
    rows = np.stack([t.a_id, t.b_id, t.a_bgn, t.a_end], axis=1).astype(np.int32)
    mesh = make_flat_mesh(8)
    out = distributed_store_sort(rows, n_reads=400, mesh=mesh)
    assert out.shape == rows.shape
    ref = rows[np.lexsort((rows[:, 1], rows[:, 0]))]
    assert np.array_equal(out, ref)


def test_distributed_sort_empty_and_small():
    mesh = make_flat_mesh(8)
    rows = np.array([[3, 1, 0, 10], [1, 2, 0, 5], [3, 0, 0, 1]], np.int32)
    out = distributed_store_sort(rows, n_reads=4, mesh=mesh)
    assert out[:, 0].tolist() == [1, 3, 3]


def test_host_shards_cover_everything():
    shards = all_host_shards(1003, 4)
    ids = [i for s in shards for i in range(s.lo, s.hi)]
    assert ids == list(range(1, 1004))
    s = host_read_shard(10, 3, 4)
    assert s.n_local >= 0


def test_sharded_stage_smoke():
    """Fast-lane mesh smoke: sharded meryl (both lanes) + ring candidates
    on the 8 virtual devices agree with single-device — so a collective
    regression surfaces without waiting for the slow lane."""
    import numpy as np

    from canu_tpu.ops import kmer as K
    from canu_tpu.ops import minhash as MH
    from canu_tpu.parallel.shard_overlap import (
        sharded_count_readset,
        sharded_find_candidates,
    )
    from canu_tpu.sim.simulate import random_genome, simulate_reads

    g = random_genome(6_000, seed=9)
    rs, _ = simulate_reads(g, coverage=4, mean_len=900, min_len=500,
                           max_len=1400, error_rate=0.04, seed=10,
                           circular=False)
    for k in (16, 22):
        sh = sharded_count_readset(rs, k=k)
        ref = K.count_readset_device(rs, k=k, block_size=64).to_host()
        order = np.argsort(ref.unique, kind="stable")
        assert np.array_equal(
            np.asarray(sh.unique, dtype=ref.unique.dtype), ref.unique[order])
        assert np.array_equal(sh.counts, ref.counts[order])
    fk = K.frequent_kmers(K.count_readset_device(rs, k=16, block_size=64),
                          distinct_fraction=0.9995)
    sk = np.asarray(MH.build_sketches(rs, k=16, n_hashes=64, frequent=fk,
                                      block_size=64))
    a = {tuple(r[:2]) for r in sharded_find_candidates(sk, min_matches=2)}
    b = {tuple(r[:2]) for r in
         np.asarray(MH.find_candidates(sk, min_matches=2, block_size=64))}
    assert a == b
