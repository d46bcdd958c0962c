"""Base-level alignment positions via forward+backward banded DP.

The falcon-sense/utgcns consensus path needs, for every evidence read
aligned to a template, the evidence coordinate at EVERY template
position (to vote bases/deletions/insertions).  The reference gets this
from alignment tracebacks (falconConsensus-alignTag.C, edlib paths); a
sequential traceback maps poorly to TPU, so instead:

    run the banded DP FORWARD (cost of aligning prefixes) and BACKWARD
    (cost of aligning suffixes); a cell is on an optimal path iff
    fwd(i,j) + bwd(i,j) equals the total cost, so the per-row argmin of
    fwd+bwd gives the evidence position j*(i) for every template row i
    in one vectorized pass — no traceback, no per-step host work.

j* is monotonized; consecutive equal j* = deletion in the evidence,
jumps > 1 = insertions.  Ambiguous-path ties diffuse a vote
occasionally, which plurality voting over ~40x evidence absorbs.

Alignment is GLOBAL over the given spans (both ends pinned), matching
how the reference aligns evidence to a template layout span
(/root/reference/src/correction/falconConsensus.C).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

INF16 = 30000  # python int (see align.py note)
SMAX = 4


def _band_starts(centers, b_len, band):
    o = jnp.clip(centers - band // 2, 0, jnp.maximum(b_len, 0)[:, None])
    o = jax.lax.associative_scan(jnp.maximum, o, axis=1)
    ramp = SMAX * jnp.arange(o.shape[1], dtype=jnp.int32)[None, :]
    return jax.lax.associative_scan(jnp.minimum, o - ramp, axis=1) + ramp


@partial(jax.jit, static_argnames=("band", "n_rows"))
def align_positions(
    t: jax.Array,  # uint8[B, LT] template chars (row 0 = first char)
    t_len: jax.Array,  # int32[B]
    e: jax.Array,  # uint8[B, LE] evidence chars
    e_len: jax.Array,  # int32[B]
    centers: jax.Array,  # int32[B, n_rows+1]
    band: int,
    n_rows: int,
):
    """Returns (j_star int32[B, n_rows+1], edits int32[B]).

    j_star[b, i] = evidence position aligned at template position i on an
    optimal global path (monotonic non-decreasing); rows beyond t_len
    hold e_len.
    """
    B = t.shape[0]
    w_ramp = jnp.arange(band, dtype=jnp.int32)[None, :]
    o_all = _band_starts(centers, e_len, band)

    def char_sub(i):
        # substitution cost vector for row i: t[i-1] vs e[j-1], j = o(i)+w
        o_i = jax.lax.dynamic_slice_in_dim(o_all, i, 1, axis=1)[:, 0]
        j = o_i[:, None] + w_ramp
        t_chr = jax.lax.dynamic_slice_in_dim(t, i - 1, 1, axis=1)
        e_idx = jnp.clip(j - 1, 0, e.shape[1] - 1)
        e_chr = jnp.take_along_axis(e, e_idx, axis=1)
        return o_i, j, (t_chr != e_chr).astype(jnp.int32)

    # ---- forward: F(i, j) = cost aligning t[:i] with e[:j] ----
    o0 = o_all[:, 0:1]
    j0 = o0 + w_ramp
    F0 = jnp.where(j0 <= e_len[:, None], j0, INF16)

    def f_step(F_prev, i):
        o_i = jax.lax.dynamic_slice_in_dim(o_all, i, 1, axis=1)[:, 0]
        o_im1 = jax.lax.dynamic_slice_in_dim(o_all, i - 1, 1, axis=1)[:, 0]
        s = (o_i - o_im1)[:, None]
        idx_up = w_ramp + s
        idx_dg = idx_up - 1
        up = jnp.where(
            (idx_up >= 0) & (idx_up < band),
            jnp.take_along_axis(F_prev, jnp.clip(idx_up, 0, band - 1), axis=1), INF16)
        dg = jnp.where(
            (idx_dg >= 0) & (idx_dg < band),
            jnp.take_along_axis(F_prev, jnp.clip(idx_dg, 0, band - 1), axis=1), INF16)
        _, j, sub = char_sub(i)
        valid_dg = (j >= 1) & (j <= e_len[:, None])
        m = jnp.minimum(up + 1, jnp.where(valid_dg, dg + sub, INF16))
        r = jax.lax.associative_scan(jnp.minimum, jnp.minimum(m - w_ramp, INF16), axis=1)
        F = jnp.minimum(r + w_ramp, INF16)
        F = jnp.where((j <= e_len[:, None]) & (i <= t_len)[:, None], F, INF16)
        return F, F

    _, F_rows = jax.lax.scan(f_step, F0, jnp.arange(1, n_rows + 1, dtype=jnp.int32))
    F_rows = jnp.concatenate([F0[None], F_rows], axis=0)  # [n_rows+1, B, band]

    # ---- backward: G(i, j) = cost aligning t[i:t_len] with e[j:e_len] ----
    def g_init_row(i):
        o_i = jax.lax.dynamic_slice_in_dim(o_all, i, 1, axis=1)[:, 0]
        j = o_i[:, None] + w_ramp
        return jnp.where(j <= e_len[:, None], e_len[:, None] - j, INF16)

    # scan downward i = n_rows-1 .. 0; carry = G(i+1) row
    G_top = g_init_row(n_rows)  # row n_rows (i == t_len only if t_len == n_rows)
    G_top = jnp.where((t_len == n_rows)[:, None], G_top, INF16)

    def g_step(G_next, i):
        o_i = jax.lax.dynamic_slice_in_dim(o_all, i, 1, axis=1)[:, 0]
        o_ip1 = jax.lax.dynamic_slice_in_dim(o_all, i + 1, 1, axis=1)[:, 0]
        s = (o_ip1 - o_i)[:, None]  # >= 0
        j = o_i[:, None] + w_ramp
        # G(i+1, j): lane in next row = j - o(i+1) = w - s
        idx_dn = w_ramp - s
        dn = jnp.where(
            (idx_dn >= 0) & (idx_dn < band),
            jnp.take_along_axis(G_next, jnp.clip(idx_dn, 0, band - 1), axis=1), INF16)
        # G(i+1, j+1): lane w - s + 1; sub cost uses t[i], e[j]
        idx_dg = idx_dn + 1
        dg = jnp.where(
            (idx_dg >= 0) & (idx_dg < band),
            jnp.take_along_axis(G_next, jnp.clip(idx_dg, 0, band - 1), axis=1), INF16)
        t_chr = jax.lax.dynamic_slice_in_dim(t, i, 1, axis=1)
        e_idx = jnp.clip(j, 0, e.shape[1] - 1)
        e_chr = jnp.take_along_axis(e, e_idx, axis=1)
        sub = (t_chr != e_chr).astype(jnp.int32)
        valid_dg = j < e_len[:, None]
        m = jnp.minimum(dn + 1, jnp.where(valid_dg, dg + sub, INF16))
        # rightward closure: G(i, j) can also come from G(i, j+1) + 1:
        # G[w] = min_{w'>=w}(m[w'] + (w'-w)) = suffix_min(m + w) - w
        rev = jnp.flip(jnp.minimum(m + w_ramp, INF16), axis=1)
        sm = jax.lax.associative_scan(jnp.minimum, rev, axis=1)
        G = jnp.minimum(jnp.flip(sm, axis=1) - w_ramp, INF16)
        G = jnp.where((j <= e_len[:, None]) & (j >= 0), G, INF16)
        # pin: at i == t_len the row is the boundary init, not the recurrence
        bound = jnp.where(j <= e_len[:, None], e_len[:, None] - j, INF16)
        G = jnp.where((i == t_len)[:, None], bound, G)
        G = jnp.where((i > t_len)[:, None], INF16, G)
        return G, G

    _, G_rows_rev = jax.lax.scan(
        g_step, G_top, jnp.arange(n_rows - 1, -1, -1, dtype=jnp.int32)
    )
    G_rows = jnp.concatenate(
        [jnp.flip(G_rows_rev, axis=0), G_top[None]], axis=0
    )  # [n_rows+1, B, band]

    # ---- combine: per-row argmin of F+G over the band ----
    total = F_rows + G_rows  # [n_rows+1, B, band]
    w_star = jnp.argmin(total, axis=2).astype(jnp.int32)  # [n_rows+1, B]
    row_min = jnp.min(total, axis=2)  # [n_rows+1, B]
    o_T = jnp.transpose(o_all, (1, 0))  # [n_rows+1, B]
    j_star = jnp.transpose(o_T + w_star, (1, 0))  # [B, n_rows+1]
    ri = jnp.arange(n_rows + 1, dtype=jnp.int32)[None, :]
    live = ri <= t_len[:, None]
    j_star = jnp.where(live, j_star, e_len[:, None])
    # enforce monotone non-decreasing (ambiguity can wobble at ties)
    j_star = jax.lax.associative_scan(jnp.maximum, j_star, axis=1)
    j_star = jnp.minimum(j_star, e_len[:, None])
    edits = jnp.min(jnp.where(jnp.transpose(live, (1, 0)), row_min, INF16), axis=0)
    return j_star, edits


@partial(jax.jit, static_argnames=("band", "n_rows", "ends_free"))
def align_positions_lean(
    t: jax.Array,  # uint8[B, >=n_rows] template chars (row 0 = first char)
    t_len: jax.Array,  # int32[B]
    e: jax.Array,  # uint8[B, LE] evidence chars
    e_len: jax.Array,  # int32[B]
    band: int,
    n_rows: int,
    ends_free: bool = False,
):
    """Memory-lean variant of align_positions for the device vote engine.

    ``ends_free=True`` makes evidence start/end gaps cost 0 (edlib HW
    mode: the template window aligns as an infix of the evidence
    window).  Consensus polish uses this — tig placements are
    hang-estimates, so evidence windows carry slack that must not be
    force-fitted; correction keeps both ends pinned (its windows come
    from verified overlap coordinates).

    Three changes versus align_positions:

      * band centers are computed internally by linear interpolation
        (0,0) -> (t_len, e_len) — correction/polish evidence windows have
        BOTH endpoints pinned by the overlap coordinates, so the straight
        line plus a Brownian-bridge-sized band covers the true path;
      * forward DP rows are stored band-normalized uint8 (edit distance
        is 1-Lipschitz along a row, so |F[w] - min_w F| <= band-1; 255
        marks out-of-band/INF) — n_rows*B*band BYTES of F storage
        instead of 2 int32 planes;
      * the backward pass folds the F+G combine in, emitting only the
        per-row optimal evidence position j*.

    Returns (j_star int32[B, n_rows+1], edits int32[B]).  Requires
    band <= 256.
    """
    assert band <= 256, "uint8 row normalization requires band <= 256"
    B = t.shape[0]
    w_ramp = jnp.arange(band, dtype=jnp.int32)[None, :]
    ri = jnp.arange(n_rows + 1, dtype=jnp.int32)
    tl = jnp.maximum(t_len, 1)[:, None]
    centers = jnp.minimum(
        (ri[None, :] * e_len[:, None] + tl // 2) // tl, e_len[:, None]
    ).astype(jnp.int32)
    o_all = _band_starts(centers, e_len, band)

    # ---- forward, emitting (uint8 normalized row, int32 row min) ----
    o0 = o_all[:, 0:1]
    j0 = o0 + w_ramp
    F0 = jnp.where(j0 <= e_len[:, None],
                   jnp.zeros_like(j0) if ends_free else j0, INF16)

    def norm(F):
        fmin = jnp.min(F, axis=1)
        d = jnp.clip(F - fmin[:, None], 0, 254).astype(jnp.uint8)
        d = jnp.where(F >= INF16, jnp.uint8(255), d)
        return d, fmin

    def f_step(F_prev, i):
        o_i = jax.lax.dynamic_slice_in_dim(o_all, i, 1, axis=1)[:, 0]
        o_im1 = jax.lax.dynamic_slice_in_dim(o_all, i - 1, 1, axis=1)[:, 0]
        s = (o_i - o_im1)[:, None]
        idx_up = w_ramp + s
        idx_dg = idx_up - 1
        up = jnp.where(
            (idx_up >= 0) & (idx_up < band),
            jnp.take_along_axis(F_prev, jnp.clip(idx_up, 0, band - 1), axis=1), INF16)
        dg = jnp.where(
            (idx_dg >= 0) & (idx_dg < band),
            jnp.take_along_axis(F_prev, jnp.clip(idx_dg, 0, band - 1), axis=1), INF16)
        j = o_i[:, None] + w_ramp
        t_chr = jax.lax.dynamic_slice_in_dim(t, i - 1, 1, axis=1)
        e_idx = jnp.clip(j - 1, 0, e.shape[1] - 1)
        e_chr = jnp.take_along_axis(e, e_idx, axis=1)
        sub = (t_chr != e_chr).astype(jnp.int32)
        valid_dg = (j >= 1) & (j <= e_len[:, None])
        m = jnp.minimum(up + 1, jnp.where(valid_dg, dg + sub, INF16))
        r = jax.lax.associative_scan(jnp.minimum, jnp.minimum(m - w_ramp, INF16), axis=1)
        F = jnp.minimum(r + w_ramp, INF16)
        F = jnp.where((j <= e_len[:, None]) & (i <= t_len)[:, None], F, INF16)
        return F, norm(F)

    F_top, (Fu_rows, Fm_rows) = jax.lax.scan(
        f_step, F0, jnp.arange(1, n_rows + 1, dtype=jnp.int32)
    )
    u0, m0 = norm(F0)
    Fu_all = jnp.concatenate([u0[None], Fu_rows], axis=0)  # [n_rows+1, B, band] u8
    Fm_all = jnp.concatenate([m0[None], Fm_rows], axis=0)  # [n_rows+1, B] int32

    # ---- backward with fused combine ----
    def g_boundary(i_arr, o_i):
        j = o_i[:, None] + w_ramp
        tail = jnp.zeros_like(j) if ends_free else e_len[:, None] - j
        return jnp.where(j <= e_len[:, None], tail, INF16)

    G_top = g_boundary(None, o_all[:, n_rows])
    G_top = jnp.where((t_len == n_rows)[:, None], G_top, INF16)

    def combine(i_scalar, o_i, G_i):
        Fu = Fu_all[i_scalar] if isinstance(i_scalar, int) else jax.lax.dynamic_index_in_dim(
            Fu_all, i_scalar, axis=0, keepdims=False)
        Fm = Fm_all[i_scalar] if isinstance(i_scalar, int) else jax.lax.dynamic_index_in_dim(
            Fm_all, i_scalar, axis=0, keepdims=False)
        tot = Fm[:, None] + Fu.astype(jnp.int32) + G_i
        bad = (Fu == 255) | (G_i >= INF16) | (Fm >= INF16)[:, None]
        tot = jnp.where(bad, INF16 * 4, tot)
        w_star = jnp.argmin(tot, axis=1).astype(jnp.int32)
        return o_i + w_star, jnp.min(tot, axis=1)

    j_top, ed_top = combine(n_rows, o_all[:, n_rows], G_top)
    edits0 = jnp.where(t_len == n_rows, ed_top, INF16 * 4)

    def g_step(carry, i):
        G_next, edits = carry
        o_i = jax.lax.dynamic_slice_in_dim(o_all, i, 1, axis=1)[:, 0]
        o_ip1 = jax.lax.dynamic_slice_in_dim(o_all, i + 1, 1, axis=1)[:, 0]
        s = (o_ip1 - o_i)[:, None]
        j = o_i[:, None] + w_ramp
        idx_dn = w_ramp - s
        dn = jnp.where(
            (idx_dn >= 0) & (idx_dn < band),
            jnp.take_along_axis(G_next, jnp.clip(idx_dn, 0, band - 1), axis=1), INF16)
        idx_dg = idx_dn + 1
        dg = jnp.where(
            (idx_dg >= 0) & (idx_dg < band),
            jnp.take_along_axis(G_next, jnp.clip(idx_dg, 0, band - 1), axis=1), INF16)
        t_chr = jax.lax.dynamic_slice_in_dim(t, i, 1, axis=1)
        e_idx = jnp.clip(j, 0, e.shape[1] - 1)
        e_chr = jnp.take_along_axis(e, e_idx, axis=1)
        sub = (t_chr != e_chr).astype(jnp.int32)
        valid_dg = j < e_len[:, None]
        m = jnp.minimum(dn + 1, jnp.where(valid_dg, dg + sub, INF16))
        rev = jnp.flip(jnp.minimum(m + w_ramp, INF16), axis=1)
        sm = jax.lax.associative_scan(jnp.minimum, rev, axis=1)
        G = jnp.minimum(jnp.flip(sm, axis=1) - w_ramp, INF16)
        G = jnp.where((j <= e_len[:, None]) & (j >= 0), G, INF16)
        tail = jnp.zeros_like(j) if ends_free else e_len[:, None] - j
        bound = jnp.where(j <= e_len[:, None], tail, INF16)
        G = jnp.where((i == t_len)[:, None], bound, G)
        G = jnp.where((i > t_len)[:, None], INF16, G)
        j_i, row_min = combine(i, o_i, G)
        edits = jnp.where(i == t_len, row_min, edits)
        return (G, edits), j_i

    (_, edits), j_rev = jax.lax.scan(
        g_step, (G_top, edits0), jnp.arange(n_rows - 1, -1, -1, dtype=jnp.int32)
    )
    j_star = jnp.concatenate(
        [jnp.flip(j_rev, axis=0), j_top[None]], axis=0
    )  # [n_rows+1, B]
    j_star = jnp.transpose(j_star, (1, 0))
    live = ri[None, :] <= t_len[:, None]
    j_star = jnp.where(live, j_star, e_len[:, None])
    j_star = jax.lax.associative_scan(jnp.maximum, j_star, axis=1)
    j_star = jnp.minimum(jnp.maximum(j_star, 0), e_len[:, None])
    return j_star, edits
