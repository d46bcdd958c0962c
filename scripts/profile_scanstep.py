"""Isolate the per-step cost of the banded-DP scan on the real TPU.

Times four 2048-step scan variants (sync via result fetch, since
block_until_ready does not sync over the axon tunnel):
  a) roll+add on [B, band]           — baseline step overhead
  b) + take_along_axis within band   — band-local gather
  c) + take_along_axis from [B, We]  — evidence-char gather
  d) full align_positions_lean       — the real kernel
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
e = jnp.asarray(rng.integers(0, 4, (B, We), dtype=np.uint8))
t = jnp.asarray(rng.integers(0, 4, (B, n_rows), dtype=np.uint8))
tl = jnp.asarray(np.full(B, n_rows - 7, np.int32))
el = jnp.asarray(np.full(B, n_rows + 99, np.int32))


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    s = float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # warm+sync
    t0 = time.time()
    out = f(*args)
    s = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    dt = time.time() - t0
    print(f"{name}: {dt:.3f}s ({dt/n_rows*1e6:.0f}us/step) sum={s:.0f}",
          flush=True)


def scan_a(x):
    def body(c, _):
        c = jnp.roll(c, 1, axis=1) + 1
        return c, None
    c, _ = jax.lax.scan(body, x, None, length=n_rows)
    return c


def scan_b(x):
    idx = jnp.asarray(rng.integers(0, band, (B, band), dtype=np.int32))
    def body(c, _):
        c = jnp.take_along_axis(c, idx, axis=1) + 1
        return c, None
    c, _ = jax.lax.scan(body, x, None, length=n_rows)
    return c


def scan_c(x):
    o = jnp.asarray(rng.integers(0, We - band, B, dtype=np.int32))
    w = jnp.arange(band, dtype=jnp.int32)[None, :]
    def body(c, i):
        j = (o[:, None] + w + i) % (We - band)
        ch = jnp.take_along_axis(e, j, axis=1)
        return c + ch.astype(jnp.int32), None
    c, _ = jax.lax.scan(body, x, jnp.arange(n_rows, dtype=jnp.int32))
    return c


x0 = jnp.zeros((B, band), jnp.int32)
timed("a roll+add        ", scan_a, x0)
timed("b band gather     ", scan_b, x0)
timed("c evidence gather ", scan_c, x0)

f = jax.jit(lambda: align_positions_lean(t, tl, e, el, band, n_rows,
                                         ends_free=True))
out = f(); s = float(jnp.sum(out[0]))
t0 = time.time()
out = f(); s = float(jnp.sum(out[0]))
print(f"d full align_lean : {time.time()-t0:.3f}s sum={s:.0f}", flush=True)
