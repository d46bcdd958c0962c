"""Ablate the _vote_many program to locate the slow stage.

Variants (each jitted, warm-run, synced via scalar fetch):
  A align-only      : js computed, votes update skipped
  B no-char-gathers : bchr/ichr/i2chr constants (keeps dj logic)
  C no-einsum       : plain sum instead of slot-one-hot matmul
  D full            : the real program
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
from canu_tpu.ops.votepile import N_CH, _gather_window, _shift_rows_right

B, band, n_rows = 256, 256, 2048
G, Lt = 256, 2048
We = n_rows + n_rows // 2
rng = np.random.default_rng(0)

words = jnp.asarray(rng.integers(0, 2**32, (512, Lt // 16), dtype=np.uint32))
wlen = jnp.asarray(np.full(512, Lt - 5, np.int32))
t_idx = jnp.asarray(rng.integers(0, 256, B, dtype=np.int32))
e_idx = jnp.asarray(rng.integers(0, 256, B, dtype=np.int32))
t_bgn = jnp.zeros(B, jnp.int32)
t_span = jnp.asarray(np.full(B, n_rows - 9, np.int32))
e_lo = jnp.zeros(B, jnp.int32)
e_span = jnp.asarray(np.full(B, n_rows + 64, np.int32))
flipped = jnp.asarray(rng.integers(0, 2, B).astype(bool))
slot = jnp.asarray(rng.integers(0, G, B, dtype=np.int32))
weight = jnp.ones(B, jnp.float32)


def core(votes, words, wlen, t_idx, e_idx, t_bgn, t_span, e_lo, e_span,
         flipped, slot, weight, mode):
    W_e = We
    t_sub = _gather_window(words, wlen, t_idx, t_bgn, None, n_rows)
    e_sub = _gather_window(words, wlen, e_idx, e_lo, flipped, W_e)
    es = jnp.minimum(e_span, W_e - 1)
    js, _ = align_positions_lean(t_sub, t_span, e_sub, es, band, n_rows,
                                 ends_free=True)
    if mode == "A":
        return votes + jnp.sum(js).astype(jnp.float32) * 1e-9
    dj = js[:, 1:] - js[:, :-1]
    rowpos = jnp.arange(n_rows, dtype=jnp.int32)[None, :]
    live = rowpos < t_span[:, None]
    active = live & (js[:, 1:] > 0) & (js[:, :-1] < es[:, None])
    if mode == "B":
        bchr = jnp.zeros((B, n_rows), jnp.uint8)
        ichr = bchr
        i2chr = bchr
    else:
        bidx = jnp.clip(js[:, 1:] - 1, 0, W_e - 1)
        bchr = jnp.take_along_axis(e_sub, bidx, axis=1)
        iidx = jnp.clip(js[:, :-1], 0, W_e - 1)
        ichr = jnp.take_along_axis(e_sub, iidx, axis=1)
        i2idx = jnp.clip(js[:, :-1] + 1, 0, W_e - 1)
        i2chr = jnp.take_along_axis(e_sub, i2idx, axis=1)
    m_base = active & (dj >= 1)
    m_del = active & (dj == 0)
    m_ins = active & (dj >= 2)
    m_ins2 = active & (dj >= 3)
    code = (
        bchr.astype(jnp.uint16)
        | (ichr.astype(jnp.uint16) << 2)
        | (m_base.astype(jnp.uint16) << 4)
        | (m_del.astype(jnp.uint16) << 5)
        | (m_ins.astype(jnp.uint16) << 6)
        | (m_ins2.astype(jnp.uint16) << 7)
        | (i2chr.astype(jnp.uint16) << 8)
    )
    if mode == "E":
        return votes + jnp.sum(code.astype(jnp.float32)) * 1e-9
    code = _shift_rows_right(code, t_bgn, Lt)
    cb = code & 3
    ci = (code >> 2) & 3
    has_b = (code >> 4) & 1
    has_d = (code >> 5) & 1
    has_i = (code >> 6) & 1
    has_i2 = (code >> 7) & 1
    ci2 = (code >> 8) & 3
    chans = [(has_b == 1) & (cb == c) for c in range(4)]
    chans.append(has_d == 1)
    chans.append(has_i == 1)
    chans += [(has_i == 1) & (ci == c) for c in range(4)]
    chans.append(has_i2 == 1)
    chans += [(has_i2 == 1) & (ci2 == c) for c in range(4)]
    contrib = jnp.stack(chans, axis=1).astype(jnp.bfloat16)
    contrib = contrib.reshape(B, N_CH * Lt)
    if mode == "C":
        delta = jnp.sum(contrib, axis=0, keepdims=True).astype(jnp.float32)
        return votes + jnp.broadcast_to(
            delta.reshape(1, N_CH, Lt), votes.shape) * (1.0 / G)
    onehot = (slot[:, None] == jnp.arange(G, dtype=jnp.int32)[None, :]).astype(
        jnp.bfloat16) * weight[:, None].astype(jnp.bfloat16)
    delta = jnp.einsum("bg,bn->gn", onehot, contrib,
                       preferred_element_type=jnp.float32)
    return votes + delta.reshape(G, N_CH, Lt)


for mode in ("A", "B", "C", "E", "D"):
    f = jax.jit(core, static_argnames=("mode",))
    votes = jnp.zeros((G, N_CH, Lt), jnp.float32)
    args = (words, wlen, t_idx, e_idx, t_bgn, t_span, e_lo, e_span,
            flipped, slot, weight)
    t0 = time.time()
    votes = f(votes, *args, mode=mode)
    s = float(jnp.sum(votes))
    t_cold = time.time() - t0
    tot = 0.0
    for _ in range(3):
        t0 = time.time()
        votes = f(votes, *args, mode=mode)
        s = float(jnp.sum(votes))
        tot += time.time() - t0
    print(f"{mode}: cold {t_cold:.1f}s warm {tot/3:.2f}s sum={s:.0f}",
          flush=True)
