"""Bisect the votepile TPU kernel fault, stage by stage.

Runs the vote program's components in increasing complexity, forcing a
device->host sync after each; the first faulting stage kills the
process (and wedges the TPU for a few minutes), so re-run after
recovery with a higher start stage if needed.

Usage: python scripts/bisect_fault.py [start_stage]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

start = int(sys.argv[1]) if len(sys.argv) > 1 else 0

import jax
import jax.numpy as jnp

from canu_tpu.ops.trace import align_positions_lean
from canu_tpu.ops.votepile import (
    VoteJobs,
    _finalize_plurality,
    _vote_many,
    pile_votes,
)

rng = np.random.default_rng(0)


def stage(n, name, fn):
    if n < start:
        return
    t0 = time.time()
    out = fn()
    s = float(jnp.sum(out)) if hasattr(out, "dtype") else out
    print(f"stage {n} OK: {name}: {time.time()-t0:.2f}s sum={s}", flush=True)


B, band, n_rows = 256, 256, 2048
G, Lt = 256, 2048
W_e = n_rows + n_rows // 2

t = jnp.asarray(rng.integers(0, 4, (B, n_rows), dtype=np.uint8))
tl = jnp.asarray(np.full(B, n_rows - 7, np.int32))
e = jnp.asarray(rng.integers(0, 4, (B, W_e), dtype=np.uint8))
el = jnp.asarray(np.full(B, n_rows + 100, np.int32))

stage(0, "warmup matmul", lambda: jnp.ones((256, 256)) @ jnp.ones((256, 256)))

stage(1, "align_lean small B=8 rows=256",
      lambda: align_positions_lean(t[:8, :256], jnp.minimum(tl[:8], 250),
                                   e[:8, :384], jnp.minimum(el[:8], 380),
                                   band, 256)[0])

stage(2, "align_lean B=256 rows=2048 pinned",
      lambda: align_positions_lean(t, tl, e, el, band, n_rows)[0])

stage(3, "align_lean B=256 rows=2048 ends_free",
      lambda: align_positions_lean(t, tl, e, el, band, n_rows,
                                   ends_free=True)[0])


def mk_packed(CP):
    n = CP * B
    packed = np.zeros((CP, 9, B), np.int32)
    packed[:, 0, :] = rng.integers(0, 64, (CP, B))       # t_idx rows
    packed[:, 1, :] = rng.integers(0, 64, (CP, B))       # e_idx
    packed[:, 2, :] = 0                                  # t_bgn
    packed[:, 3, :] = n_rows - 9                         # t_span
    packed[:, 4, :] = 0                                  # e_lo
    packed[:, 5, :] = n_rows + 64                        # e_span
    packed[:, 6, :] = rng.integers(0, 2, (CP, B))        # flipped
    packed[:, 7, :] = rng.integers(0, G, (CP, B))        # slot
    packed[:, 8, :] = np.ones((CP, B), np.float32).view(np.int32)
    return jnp.asarray(packed)


words = jnp.asarray(rng.integers(0, 2**32, (128, Lt // 16), dtype=np.uint32))
wlen = jnp.asarray(np.full(128, Lt - 5, np.int32))
votes0 = jnp.zeros((G, 15, Lt), jnp.float32)

stage(4, "_vote_many CP=1", lambda: _vote_many(
    votes0, words, wlen, words, wlen, mk_packed(1), band, n_rows, Lt, G, True))

votes0 = jnp.zeros((G, 15, Lt), jnp.float32)
stage(5, "_vote_many CP=8", lambda: _vote_many(
    votes0, words, wlen, words, wlen, mk_packed(8), band, n_rows, Lt, G, True))

votes = jnp.zeros((G, 15, Lt), jnp.float32) + 1.0
t_idx = jnp.asarray(np.arange(G, dtype=np.int32) % 128)
stage(6, "_finalize_plurality", lambda: _finalize_plurality(
    words, wlen, t_idx, votes, 2.0, Lt, False)[0].astype(jnp.float32))

jobs = VoteJobs(
    t_idx=rng.integers(0, 64, 4000).astype(np.int32),
    e_idx=rng.integers(0, 64, 4000).astype(np.int32),
    t_bgn=np.zeros(4000, np.int32),
    t_span=np.full(4000, 1990, np.int32),
    e_lo=np.zeros(4000, np.int32),
    e_span=np.full(4000, 2100, np.int32),
    flipped=rng.integers(0, 2, 4000).astype(bool),
    slot=rng.integers(0, G, 4000).astype(np.int32),
)
stage(7, "pile_votes 4000 jobs", lambda: pile_votes(
    words, wlen, words, wlen, jobs, G, Lt, band=band, ends_free=True))

print("ALL STAGES OK", flush=True)
