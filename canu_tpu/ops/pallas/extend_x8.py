"""8-pair sublane-packed Pallas kernel for banded extension.

The single-pair kernel (extend.py) runs the band across lanes but uses
only 1 of the VPU's 8 sublanes and pays several scalar extractions per
row (~940 cycles/row measured).  This kernel packs EIGHT read pairs into
the sublane dimension so every vector op serves 8 pairs:

  * per-pair band shifts s in [0, SMAX] become a select over SMAX+2
    statically-rolled copies of the DP row (per-sublane selects are
    plain vector ops; per-sublane dynamic rotates don't exist);
  * the B-character window is maintained INCREMENTALLY in a VMEM scratch
    (8, wwin) tile, shifted by the same select-of-rolls and refilled
    from HBM-backed refs every 32 rows (drift <= 32*SMAX < wwin-band);
  * per-row scalars (band start o(i), A char) are extracted for all 8
    pairs at once from (8, 256)/(8, 128) register tiles loaded once per
    128-row outer tile — a two-level row loop;
  * pairs finish at different rows: finished pairs FREEZE (s = 0, no
    captures) so one program runs to the group's max a_len; the caller
    sorts pairs by length so groups are homogeneous.

Same band-start schedule (slope clamp SMAX) and semantics as
canu_tpu.ops.align.banded_extend — results are bit-identical.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1 << 28
SMAX = 4
LANE = 128
GROUP = 8
REFILL = 32  # rows between window refills; REFILL*SMAX must stay < wwin-band


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _prefix_min_rows(r: jax.Array, band: int) -> jax.Array:
    """Prefix min along lanes, independently per sublane. r: (8, band)."""
    w = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
    k = 1
    while k < band:
        rolled = pltpu.roll(r, k, axis=1)
        r = jnp.minimum(r, jnp.where(w >= k, rolled, INF))
        k *= 2
    return r


def _select_shift(X: jax.Array, s: jax.Array, n: int, lo: int, hi: int, fill) -> jax.Array:
    """Y[p, w] = X[p, w + s[p]] for per-sublane s in [lo, hi].

    Built from static rolls + per-sublane selects; out-of-range lanes get
    `fill`.
    """
    w = jax.lax.broadcasted_iota(jnp.int32, X.shape, 1)
    out = jnp.full_like(X, fill)
    for k in range(lo, hi + 1):
        rolled = pltpu.roll(X, (-k) % n, axis=1)
        rolled = jnp.where((w + k >= 0) & (w + k < n), rolled, fill)
        out = jnp.where(s == k, rolled, out)
    return out


def _extend_x8_kernel(
    alen_ref,  # int32[B] scalar-prefetch
    blen_ref,  # int32[B] scalar-prefetch
    o_ref,  # int32[1, 8, n_o_pad] band starts
    a_ref,  # int32[1, 8, LA] A chars
    b_ref,  # int32[1, 8, LBp] B chars shifted (index j -> b[j-1])
    out_ref,  # int32[1, 8, 128]
    bwin_scr,  # int32 VMEM (8, wwin)
    *,
    band: int,
    wwin: int,
):
    g = pl.program_id(0)
    subl = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0)
    al = jnp.zeros((GROUP, 1), jnp.int32)
    bl = jnp.zeros((GROUP, 1), jnp.int32)
    max_al = alen_ref[g * GROUP]
    for p in range(GROUP):
        al = jnp.where(subl == p, alen_ref[g * GROUP + p], al)
        bl = jnp.where(subl == p, blen_ref[g * GROUP + p], bl)
        max_al = jnp.maximum(max_al, alen_ref[g * GROUP + p])

    w_ramp = jax.lax.broadcasted_iota(jnp.int32, (GROUP, band), 1)

    # row 0: D(0, j) = j, o(0) = 0; initial window at o = 0 (static slice)
    D0 = jnp.where(w_ramp <= bl, w_ramp, INF)
    best0 = jnp.where(bl[:, 0:1] < band, bl[:, 0:1], INF)
    bwin_scr[:, :] = b_ref[0, :, 0:wwin]

    def refill(o_at):
        """Reload the window so bwin[p, w] = b_shift[p, o_at[p] + w]."""
        cur = bwin_scr[:, :]
        new = cur
        for p in range(GROUP):
            o_p = jnp.min(jnp.where(subl == p, o_at, INF))
            base_p = pl.multiple_of((o_p // LANE) * LANE, LANE)
            rowv = b_ref[0, p : p + 1, pl.ds(base_p, wwin + LANE)]
            rot = pltpu.roll(rowv, (wwin + LANE) - (o_p - base_p), axis=1)
            new = jnp.where(subl == p, rot[:, :wwin], new)
        bwin_scr[:, :] = new

    def outer(T, carry):
        D, o_prev, best_bx, aend_bx = carry
        base = pl.multiple_of(T * LANE, LANE)
        o_tile = o_ref[0, :, pl.ds(base, 2 * LANE)]  # (8, 256)
        a_tile = a_ref[0, :, pl.ds(base, LANE)]  # (8, 128)
        lane256 = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 2 * LANE), 1)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (GROUP, LANE), 1)

        def inner(r, c2):
            D, o_prev, best_bx, aend_bx = c2
            i = base + r
            row_live = i <= al  # (8,1)
            o_col = jnp.min(
                jnp.where(lane256 == r, o_tile, INF), axis=1, keepdims=True
            )
            a_col = jnp.min(
                jnp.where(lane128 == r - 1, a_tile, INF), axis=1, keepdims=True
            )
            o_used = jnp.where(row_live, o_col, o_prev)
            s = o_used - o_prev  # (8,1), 0..SMAX (0 when frozen)

            # refill BEFORE the shift, at o_prev: the shift by s below then
            # brings the fresh window to o_used like any other row
            @pl.when(i % REFILL == 1)
            def _():
                refill(o_prev)

            bwin = bwin_scr[:, :]
            bwin = _select_shift(bwin, s, wwin, 0, SMAX, -1)
            bwin_scr[:, :] = bwin
            b_chr = bwin[:, :band]

            up = _select_shift(D, s, band, 0, SMAX, INF)
            dg = _select_shift(D, s - 1, band, -1, SMAX - 1, INF)
            j = o_used + w_ramp
            sub = (b_chr != a_col).astype(jnp.int32)
            valid_dg = (j >= 1) & (j <= bl)
            m = jnp.minimum(up + 1, jnp.where(valid_dg, dg + sub, INF))
            r_ = _prefix_min_rows(jnp.minimum(m - w_ramp, INF), band)
            D_new = r_ + w_ramp
            D_new = jnp.where(j <= bl, D_new, INF)
            D = jnp.where(row_live, D_new, D)

            # capture the j == b_len column
            w_col = bl - o_used  # (8,1)
            cost_col = jnp.min(
                jnp.where((w_ramp == w_col) & row_live, D, INF), axis=1, keepdims=True
            )
            better = cost_col < best_bx
            best_bx = jnp.where(better, cost_col, best_bx)
            aend_bx = jnp.where(better, i, aend_bx)
            return (D, o_used, best_bx, aend_bx)

        return jax.lax.fori_loop(1, LANE + 1, inner, (D, o_prev, best_bx, aend_bx))

    n_tiles = (max_al + LANE - 1) // LANE
    D, o_last, best_bx, aend_bx = jax.lax.fori_loop(
        0, n_tiles, outer,
        (D0, jnp.zeros((GROUP, 1), jnp.int32), best0, jnp.zeros((GROUP, 1), jnp.int32)),
    )

    # A-exhausted: best cell of each pair's frozen final row
    j_fin = o_last + w_ramp
    Dfin = jnp.where(j_fin <= bl, D, INF)
    cost_ax = jnp.min(Dfin, axis=1, keepdims=True)
    wbest = jnp.min(jnp.where(Dfin == cost_ax, w_ramp, INF), axis=1, keepdims=True)
    use_ax = cost_ax <= best_bx
    edits = jnp.where(use_ax, cost_ax, best_bx)
    a_used = jnp.where(use_ax, al, aend_bx)
    b_used = jnp.where(use_ax, o_last + wbest, bl)
    lane = jax.lax.broadcasted_iota(jnp.int32, (GROUP, LANE), 1)
    out = jnp.where(
        lane == 0, edits, jnp.where(lane == 1, a_used, jnp.where(lane == 2, b_used, 0))
    )
    out_ref[0, :, :] = out


@partial(jax.jit, static_argnames=("band", "n_rows", "interpret"))
def banded_extend_pallas_x8(
    a: jax.Array,  # uint8[B, LA]
    a_len: jax.Array,  # int32[B]
    b: jax.Array,  # uint8[B, LB]
    b_len: jax.Array,  # int32[B]
    centers: jax.Array,  # int32[B, n_rows+1]
    band: int,
    n_rows: int,
    interpret: bool = False,
):
    """Drop-in equivalent of banded_extend; B must be a multiple of 8."""
    assert band % 128 == 0 and band >= 128
    B = a.shape[0]
    assert B % GROUP == 0, f"B={B} must be a multiple of {GROUP}"
    wwin = band + 2 * LANE
    assert REFILL * SMAX < wwin - band

    o_all = jnp.clip(centers - band // 2, 0, jnp.maximum(b_len, 0)[:, None])
    o_all = jax.lax.associative_scan(jnp.maximum, o_all, axis=1)
    ramp = SMAX * jnp.arange(o_all.shape[1], dtype=jnp.int32)[None, :]
    o_all = jax.lax.associative_scan(jnp.minimum, o_all - ramp, axis=1) + ramp

    n_o_pad = _round_up(n_rows + 1, LANE) + 2 * LANE  # outer tile reads (base, 256)
    o_pad = jnp.pad(
        o_all, ((0, 0), (0, n_o_pad - o_all.shape[1])), mode="edge"
    ).astype(jnp.int32)
    LA = _round_up(max(a.shape[1], LANE), LANE) + LANE
    a_pad = jnp.pad(a.astype(jnp.int32), ((0, 0), (0, LA - a.shape[1])))
    LBp = _round_up(b.shape[1] + 1 + wwin + 3 * LANE, LANE)
    b_shift = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), b.astype(jnp.int32)], axis=1
    )
    b_pad = jnp.pad(b_shift, ((0, 0), (0, LBp - b_shift.shape[1])), constant_values=-1)

    G = B // GROUP
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, GROUP, n_o_pad), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GROUP, LA), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GROUP, LBp), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, GROUP, 128), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((GROUP, wwin), jnp.int32)],
    )
    out = pl.pallas_call(
        partial(_extend_x8_kernel, band=band, wwin=wwin),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, GROUP, 128), jnp.int32),
        interpret=interpret,
    )(
        a_len.astype(jnp.int32),
        b_len.astype(jnp.int32),
        o_pad.reshape(G, GROUP, n_o_pad),
        a_pad.reshape(G, GROUP, LA),
        b_pad.reshape(G, GROUP, LBp),
    )
    flat = out.reshape(B, 128)
    return flat[:, 0], flat[:, 1], flat[:, 2]
