"""AOT-timed align_positions_lean with EXPLICIT device args (no
closure constants XLA could fold).  Reports amortized per-call wall.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from canu_tpu.ops.trace import align_positions_lean

B, band, n_rows = 256, 256, 2048
We = n_rows + n_rows // 2
rng = np.random.default_rng(0)
t = jnp.asarray(rng.integers(0, 4, (B, n_rows), dtype=np.uint8))
tl = jnp.asarray(np.full(B, n_rows - 7, np.int32))
e = jnp.asarray(rng.integers(0, 4, (B, We), dtype=np.uint8))
el = jnp.asarray(np.full(B, n_rows + 99, np.int32))
jax.block_until_ready(t)

t0 = time.time()
compiled = align_positions_lean.lower(t, tl, e, el, band, n_rows,
                                      ends_free=True).compile()
print(f"# compile {time.time()-t0:.1f}s", flush=True)


def run_k(k):
    t0 = time.time()
    outs = [compiled(t, tl, e, el) for _ in range(k)]
    s = sum(float(o[1][0]) for o in outs)  # scalar fetch syncs everything
    return time.time() - t0, s


t1, s = run_k(1)
print(f"# 1 call: {t1:.2f}s sum={s}", flush=True)
t6, s = run_k(6)
print(f"# 6 calls: {t6:.2f}s -> per-call {(t6-t1)/5:.2f}s", flush=True)
