"""Precompile the vote-engine shapes into the persistent XLA cache.

Remote-TPU (axon tunnel) compiles of the vote/DP programs take minutes
to tens of minutes PER SHAPE; execution is fast.  Shapes are canonical
(device word planes pad both dims to powers of two), so one precompile
pass serves every subsequent run of similar scale.  Run this before the
first big assembly on a fresh cache:

    python scripts/precompile.py [max_read_len] [n_reads]

Compiles, per geometry: _vote_many at CP in {8, 1} (pinned + ends-free),
_finalize_plurality (both keep_template variants) and _finalize_red.
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

    import jax
    import jax.numpy as jnp

    from canu_tpu.ops.votepile import (
        CHUNK_CELL_BUDGET,
        CHUNKS_PER_DISPATCH,
        N_CH,
        _finalize_plurality,
        _finalize_red,
        _vote_many,
        block_geometry,
    )
    from canu_tpu.utils.bitpack import n_words

    W = 1 << max(0, int(n_words(max_len) - 1).bit_length())
    R = (1 << max(0, int(n_reads).bit_length())) + 1
    G, Lt = block_geometry(max_len)
    print(f"# planes rows={R} W={W}; block G={G} Lt={Lt}", flush=True)
    e_words = jnp.zeros((R, W), jnp.uint32)
    e_len = jnp.zeros((R,), jnp.int32)

    def compile_geometry(t_rows, t_W, Lt_g, G_g, ends_free, tag,
                         keeps=(False,), red=False):
        t_words = jnp.zeros((t_rows, t_W), jnp.uint32)
        t_len = jnp.zeros((t_rows,), jnp.int32)
        n_rows = Lt_g
        B = max(32, min(256, CHUNK_CELL_BUDGET // n_rows))
        for CP in (CHUNKS_PER_DISPATCH, 1):
            t0 = time.time()
            votes = jnp.zeros((G_g, N_CH, Lt_g), jnp.float32)
            votes = _vote_many(
                votes, t_words, t_len, e_words, e_len,
                jnp.zeros((CP, 9, B), jnp.int32), 256, n_rows, Lt_g, G_g,
                ends_free,
            )
            np.asarray(votes[0, 0, :1])  # force compile + execute
            print(f"# {tag} _vote_many CP={CP}: {time.time()-t0:.1f}s",
                  flush=True)
        t_idx = jnp.zeros((G_g,), jnp.int32)
        votes = jnp.zeros((G_g, N_CH, Lt_g), jnp.float32)
        for keep in keeps:
            t0 = time.time()
            packed, _cov = _finalize_plurality(
                t_words, t_len, t_idx, votes, 2.0, Lt_g, keep
            )
            np.asarray(packed[0, :1])
            print(f"# {tag} finalize keep={keep}: {time.time()-t0:.1f}s",
                  flush=True)
        if red:
            t0 = time.time()
            out = _finalize_red(t_words, t_len, t_idx, votes, 4.0, 1.0, Lt_g)
            np.asarray(out[0, :1])
            print(f"# {tag} finalize_red: {time.time()-t0:.1f}s", flush=True)

    # correction / RED geometry: templates and evidence share the read plane
    compile_geometry(R, W, Lt, G, False, "correction", keeps=(False,),
                     red=True)
    # polish geometry: 4096-base segment templates, reads as evidence
    from canu_tpu.ops.consensus import _POLISH_SEG

    seg_W = 1 << max(0, int(n_words(_POLISH_SEG) - 1).bit_length())
    for seg_rows in (129, 257, 513):
        compile_geometry(seg_rows, seg_W, _POLISH_SEG,
                         max(8, min(256, (1 << 21) // _POLISH_SEG)),
                         True, f"polish[{seg_rows}]", keeps=(True,))
    print("# precompile done", flush=True)


if __name__ == "__main__":
    main()
