"""Stage-2 fault bisection: is it the chunk-scan length or donation?

Usage: python scripts/bisect_fault2.py <mode>
  mode cp1     : 50 CP=1 dispatches (stress the known-good path)
  mode nodon   : CP=8 without donate_argnums
  mode cp2     : CP=2 with donation
  mode cp4     : CP=4 with donation
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

mode = sys.argv[1]

import jax
import jax.numpy as jnp

from canu_tpu.ops import votepile
from canu_tpu.ops.votepile import _vote_chunk_core

B, band, n_rows = 256, 256, 2048
G, Lt = 256, 2048
rng = np.random.default_rng(0)


@partial(jax.jit, static_argnames=("band", "n_rows", "Lt", "G", "ends_free"))
def _vote_many_nodonate(votes, t_words, t_lengths, e_words, e_lengths,
                        packed_cols, band, n_rows, Lt, G, ends_free=False):
    def body(v, xs):
        flipped = xs[6] != 0
        weight = jax.lax.bitcast_convert_type(xs[8], jnp.float32)
        v = _vote_chunk_core(
            v, t_words, t_lengths, e_words, e_lengths,
            xs[0], xs[1], xs[2], xs[3], xs[4], xs[5], flipped, xs[7], weight,
            band=band, n_rows=n_rows, Lt=Lt, G=G, ends_free=ends_free,
        )
        return v, None

    votes, _ = jax.lax.scan(body, votes, packed_cols)
    return votes


def mk_packed(CP):
    packed = np.zeros((CP, 9, B), np.int32)
    packed[:, 0, :] = rng.integers(0, 64, (CP, B))
    packed[:, 1, :] = rng.integers(0, 64, (CP, B))
    packed[:, 3, :] = n_rows - 9
    packed[:, 5, :] = n_rows + 64
    packed[:, 6, :] = rng.integers(0, 2, (CP, B))
    packed[:, 7, :] = rng.integers(0, G, (CP, B))
    packed[:, 8, :] = np.ones((CP, B), np.float32).view(np.int32)
    return jnp.asarray(packed)


words = jnp.asarray(rng.integers(0, 2**32, (128, Lt // 16), dtype=np.uint32))
wlen = jnp.asarray(np.full(128, Lt - 5, np.int32))
votes = jnp.zeros((G, 15, Lt), jnp.float32)
print(float(jnp.sum(jnp.ones((8, 8)))), flush=True)  # device warm

if mode == "cp1":
    pk = mk_packed(1)
    for i in range(50):
        t0 = time.time()
        votes = votepile._vote_many(votes, words, wlen, words, wlen, pk,
                                    band, n_rows, Lt, G, True)
        s = float(jnp.sum(votes[:, 0, :]))
        if i % 10 == 0 or i < 3:
            print(f"cp1 disp {i}: {time.time()-t0:.2f}s sum={s:.0f}", flush=True)
    print("MODE cp1 OK", flush=True)
elif mode == "nodon":
    pk = mk_packed(8)
    for i in range(6):
        t0 = time.time()
        votes = _vote_many_nodonate(votes, words, wlen, words, wlen, pk,
                                    band, n_rows, Lt, G, True)
        s = float(jnp.sum(votes[:, 0, :]))
        print(f"nodon disp {i}: {time.time()-t0:.2f}s sum={s:.0f}", flush=True)
    print("MODE nodon OK", flush=True)
else:
    CP = {"cp2": 2, "cp4": 4}[mode]
    pk = mk_packed(CP)
    for i in range(6):
        t0 = time.time()
        votes = votepile._vote_many(votes, words, wlen, words, wlen, pk,
                                    band, n_rows, Lt, G, True)
        s = float(jnp.sum(votes[:, 0, :]))
        print(f"{mode} disp {i}: {time.time()-t0:.2f}s sum={s:.0f}", flush=True)
    print(f"MODE {mode} OK", flush=True)
