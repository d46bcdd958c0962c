"""Precompile the hot device programs into the persistent XLA cache.

Remote-TPU (axon tunnel) compiles cost ~30-120 s per shape; execution
is fast.  Shapes are canonical (pow2-quantized planes, fixed segment
geometry), so one precompile pass serves every subsequent run of
similar scale.  Run before the first big assembly on a fresh cache:

    python scripts/precompile.py [max_read_len] [n_reads] [n_segments]

Covers: the vote engine (_vote_many at the canonical segment geometry,
ends-free; both _finalize_plurality variants; _finalize_red) for the
given evidence/segment plane ladder, and the overlap verify path
(sketch + match + Myers verification) via one tiny bench-shaped pass.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    max_len = int(float(sys.argv[1])) if len(sys.argv) > 1 else 8000
    n_reads = int(float(sys.argv[2])) if len(sys.argv) > 2 else 6000
    n_segs = int(float(sys.argv[3])) if len(sys.argv) > 3 else 0

    import jax
    import jax.numpy as jnp

    from canu_tpu.ops.falcon import VOTE_SEG
    from canu_tpu.ops.votepile import (
        CHUNK_CELL_BUDGET,
        N_CH,
        _finalize_plurality,
        _finalize_red,
        _vote_many,
    )
    from canu_tpu.utils.bitpack import n_words

    S = VOTE_SEG
    W = 1 << max(0, int(n_words(max_len) - 1).bit_length())
    R_e = max(128, 1 << max(0, int(n_reads).bit_length())) + 1
    if n_segs <= 0:
        # segments ~= total bases / S; read plane rows x mean length
        n_segs = max(1024, (n_reads * max_len // 2) // S)
    R_t = max(1024, 1 << max(0, int(n_segs).bit_length()))
    G = 256
    B = max(32, min(256, CHUNK_CELL_BUDGET // S))
    band = 256
    print(f"# e-plane [{R_e},{W}] t-plane [{R_t},{S//16}] "
          f"G={G} B={B} S={S}", flush=True)

    e_words = jnp.zeros((R_e, W), jnp.uint32)
    e_len = jnp.zeros((R_e,), jnp.int32)
    t_words = jnp.zeros((R_t, S // 16), jnp.uint32)
    t_len = jnp.zeros((R_t,), jnp.int32)

    votes = jnp.zeros((G, N_CH, S), jnp.float32)
    t0 = time.time()
    votes = _vote_many(votes, t_words, t_len, e_words, e_len,
                       jnp.zeros((9, B), jnp.int32), band, S, S, G, True)
    np.asarray(votes[0, 0, :1])
    print(f"# _vote_many ends-free: {time.time()-t0:.1f}s", flush=True)

    t_idx = jnp.zeros((G,), jnp.int32)
    for keep in (False, True):
        t0 = time.time()
        pk, _cov = _finalize_plurality(t_words, t_len, t_idx, votes, 2.0, S,
                                       keep)
        np.asarray(pk[0, :1])
        print(f"# finalize keep={keep}: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = _finalize_red(t_words, t_len, t_idx, votes, 4.0, 1.0, S)
    np.asarray(out[0, :1])
    print(f"# finalize_red: {time.time()-t0:.1f}s", flush=True)

    # overlap verify path at bench shapes (sketch/match/verify programs
    # are shape-stable across scales: block-quantized batches)
    from canu_tpu.ops import align as AL
    from canu_tpu.ops import kmer as K
    from canu_tpu.ops import minhash as MH
    from canu_tpu.sim.simulate import random_genome, simulate_reads

    g = random_genome(60_000, seed=1)
    rs, _ = simulate_reads(g, coverage=6, mean_len=3500, min_len=1500,
                           max_len=min(max_len, 7800), error_rate=0.10,
                           seed=2)
    t0 = time.time()
    kc = K.count_readset_device(rs, k=16, block_size=128)
    fk = K.frequent_kmers(kc, distinct_fraction=0.9995)
    sk = MH.build_sketches(rs, k=16, n_hashes=512, frequent=fk,
                           block_size=128)
    pairs = MH.find_candidates(sk, min_matches=2, block_size=1024)
    ov = AL.verify_overlaps(rs, pairs, band=128, max_erate=0.35,
                            min_overlap=500, chunk=512, min_shared=4)
    print(f"# overlap path (count/sketch/match/verify): "
          f"{time.time()-t0:.1f}s -> {len(ov)} overlaps", flush=True)
    print("# precompile done", flush=True)


if __name__ == "__main__":
    main()
