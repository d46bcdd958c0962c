"""Sharded overlap step on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from canu_tpu.ops.hashing import hash_seeds
from canu_tpu.parallel.mesh import (
    _count_matches,
    _local_sketch,
    make_overlap_mesh,
    sharded_overlap_step,
)
from canu_tpu.sim.simulate import random_genome, simulate_reads
from canu_tpu.utils.bitpack import n_words


def _block(rs, n_reads, W):
    ids = np.arange(1, min(rs.n_reads, n_reads) + 1)
    words, lengths = rs.block_words(ids, W)
    if len(ids) < n_reads:
        pad = n_reads - len(ids)
        words = np.vstack([words, np.zeros((pad, W), np.uint32)])
        lengths = np.concatenate([lengths, np.zeros(pad, np.int32)])
    return words, lengths


def test_mesh_shapes():
    assert len(jax.devices()) >= 8
    mesh = make_overlap_mesh(8)
    assert mesh.shape == {"r": 4, "h": 2}
    mesh = make_overlap_mesh(4)
    assert mesh.shape == {"r": 2, "h": 2}


def test_sharded_matches_single_device():
    g = random_genome(6000, seed=99)
    rs, _ = simulate_reads(g, coverage=6, mean_len=700, min_len=400, error_rate=0.05, seed=98)
    N, H, k = 32, 32, 16
    W = 1 << (n_words(rs.max_length) - 1).bit_length()
    words, lengths = _block(rs, N, W)
    seeds = hash_seeds(H)
    fk = np.full(1, 0xFFFFFFFF, np.uint32)

    mesh = make_overlap_mesh(8)
    step = sharded_overlap_step(mesh, k=k, min_matches=2)
    cnt_sharded = np.asarray(
        step(jnp.asarray(words), jnp.asarray(lengths), jnp.asarray(seeds), jnp.asarray(fk))
    )

    # single-device reference
    sk = _local_sketch(jnp.asarray(words), jnp.asarray(lengths), jnp.asarray(seeds), jnp.asarray(fk), k)
    cnt_ref = np.asarray(_count_matches(sk, sk, 2))
    np.testing.assert_array_equal(cnt_sharded, cnt_ref)
    # overlapping reads should actually share sketch slots
    assert (np.diagonal(cnt_ref)[np.asarray(lengths) > 0] > 0).all()
    assert (cnt_ref - np.diag(np.diagonal(cnt_ref))).max() > 0


def test_sharded_kmer_count_all_to_all():
    """Hash-range k-mer counting over all_to_all == single-device counts."""
    from canu_tpu.ops.kmer import INVALID_KMER, extract_kmers
    from canu_tpu.parallel.mesh import make_shard_mesh, sharded_kmer_count_step

    g = random_genome(5000, seed=21)
    rs, _ = simulate_reads(g, coverage=5, mean_len=600, min_len=400,
                           error_rate=0.04, seed=22)
    N, k = 24, 14
    W = 1 << (n_words(rs.max_length) - 1).bit_length()
    words, lengths = _block(rs, N, W)

    mesh = make_shard_mesh(8)
    step = sharded_kmer_count_step(mesh, k=k)
    kmers, counts, hist, dropped = step(jnp.asarray(words), jnp.asarray(lengths))
    kmers, counts = np.asarray(kmers).reshape(-1), np.asarray(counts).reshape(-1)
    assert int(dropped) == 0

    # reference: numpy count of all canonical k-mers
    canon, _ = extract_kmers(jnp.asarray(words), jnp.asarray(lengths), k)
    ref = np.asarray(canon).reshape(-1)
    ref = ref[ref != INVALID_KMER]
    ref_k, ref_c = np.unique(ref, return_counts=True)

    got = {int(km): int(c) for km, c in zip(kmers, counts)
           if km != INVALID_KMER and c > 0}
    assert got == {int(a): int(b) for a, b in zip(ref_k, ref_c)}

    # histogram (bins >= 1) matches the reference count-of-counts
    ref_hist = np.bincount(np.minimum(ref_c, 64), minlength=65)
    np.testing.assert_array_equal(np.asarray(hist)[1:], ref_hist[1:])


@pytest.mark.slow
def test_ring_candidates_match_single_device():
    """sharded_find_candidates must produce the SAME pair set as the
    single-device block x block pass (half-ring dedup correctness)."""
    import numpy as np
    from canu_tpu.ops import kmer as K, minhash as MH
    from canu_tpu.parallel.shard_overlap import (
        sharded_count_readset, sharded_find_candidates,
    )
    from canu_tpu.sim.simulate import random_genome, simulate_reads

    g = random_genome(20_000, seed=70)
    rs, _ = simulate_reads(
        g, coverage=6, mean_len=1200, min_len=700, error_rate=0.08, seed=71,
        circular=False,
    )
    kc = K.count_readset_device(rs, k=16, block_size=64)
    fk = K.frequent_kmers(kc, distinct_fraction=0.9995)
    sk = MH.build_sketches(rs, k=16, n_hashes=256, frequent=fk, block_size=64)

    single = MH.find_candidates(sk, min_matches=2, block_size=32)
    ring = sharded_find_candidates(sk, min_matches=2)
    assert len(ring) == len(single), (len(ring), len(single))
    np.testing.assert_array_equal(ring, single)

    # distributed meryl parity: same distinct k-mers and counts
    kc2 = sharded_count_readset(rs, k=16)
    host = kc.to_host()
    np.testing.assert_array_equal(kc2.unique, host.unique)
    np.testing.assert_array_equal(kc2.counts, host.counts)
