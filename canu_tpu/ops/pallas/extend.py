"""Pallas TPU kernel for banded semi-global extension.

The hot loop of overlap verification (see canu_tpu.ops.align for the
algorithm and the XLA reference implementation).  The XLA lax.scan
version dispatches one op-bundle per DP row (~0.5 ms/row on the tunnel,
33M cells/s); this kernel keeps the whole DP row in vector registers and
loops over rows ON CORE, replacing the reference's per-thread
prefixEditDistance inner loop (/root/reference/src/overlapInCore/
liboverlap/prefixEditDistance.H) with a VPU-vectorized band.

Mosaic constraints shape the implementation: VMEM vector loads must be
128-lane aligned, so all dynamic indexing uses the aligned-load +
dynamic-rotate pattern —

  * scalars (per-row band start o(i), A char): load the aligned 128-lane
    tile containing the index, extract the lane with a masked min-reduce;
  * the B-char band window at dynamic start o(i): load an aligned
    (band+128)-lane window via pl.multiple_of, rotate with pltpu.roll,
    keep the first `band` lanes;
  * the previous DP row shifted by the per-row band slide s (<= SMAX):
    pltpu.roll with out-of-range lanes masked to INF.

The within-row min-plus closure D[w] = min_{w'<=w}(m[w'] + (w-w')) is a
prefix-min of (m[w]-w) in log2(band) roll+min steps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1 << 28  # plain int: jnp arrays captured in a pallas kernel are rejected
SMAX = 4  # max band shift per row (slope clamp on the band-start schedule)
LANE = 128


def _prefix_min(r: jax.Array, band: int) -> jax.Array:
    """Prefix minimum along the last axis (lanes) via doubling. r: [1, band]."""
    w = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
    k = 1
    while k < band:
        rolled = pltpu.roll(r, k, axis=1)
        r = jnp.minimum(r, jnp.where(w >= k, rolled, INF))
        k *= 2
    return r


def _extract_scalar(ref3, idx):
    """ref3[0, 0, idx] via an aligned tile load + masked reduce."""
    base = pl.multiple_of((idx // LANE) * LANE, LANE)
    tile = ref3[0, 0:1, pl.ds(base, LANE)]  # (1, LANE)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    return jnp.min(jnp.where(lane == idx - base, tile, INF))


def _window(ref3, start, width):
    """ref3[0, 0, start:start+width] via aligned load + rotate. (1, width)."""
    base = pl.multiple_of((start // LANE) * LANE, LANE)
    n = width + LANE
    tile = ref3[0, 0:1, pl.ds(base, n)]  # (1, n)
    r = start - base  # in [0, LANE)
    rolled = pltpu.roll(tile, n - r, axis=1)  # rolled[w] = tile[(w + r) % n]
    return rolled[:, :width]


def _shift_lanes(x: jax.Array, t, n: int) -> jax.Array:
    """y[w] = x[w + t] with INF outside [0, n); x is (1, n), t traced."""
    w = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    rolled = pltpu.roll(x, jnp.mod(n - t, n), axis=1)
    valid = (w + t >= 0) & (w + t < n)
    return jnp.where(valid, rolled, INF)


def _extend_kernel(
    alen_ref,  # int32[B] scalar-prefetch (SMEM)
    blen_ref,  # int32[B] scalar-prefetch (SMEM)
    o_ref,  # int32[1, 1, n_rows_pad] band starts per row (row i at index i)
    a_ref,  # int32[1, 1, LA] A chars
    b_ref,  # int32[1, 1, LBp] B chars shifted: b_ref[..., j] == b[j-1]
    out_ref,  # int32[1, 1, 128] -> [edits, a_used, b_used] in lanes 0..2
    *,
    band: int,
):
    g = pl.program_id(0)
    a_len = alen_ref[g]
    b_len = blen_ref[g]
    w_ramp = jax.lax.broadcasted_iota(jnp.int32, (1, band), 1)

    # row 0: D(0, j) = j   (o(0) == 0)
    D0 = jnp.where(w_ramp <= b_len, w_ramp, INF)
    # row-0 capture of the j == b_len column (B fully consumed already)
    best0 = jnp.where(b_len < band, b_len, jnp.int32(INF))

    def body(i, carry):
        D_prev, o_prev, best_bx, aend_bx = carry
        o_i = _extract_scalar(o_ref, i)
        s = o_i - o_prev
        up = _shift_lanes(D_prev, s, band)
        dg = _shift_lanes(D_prev, s - 1, band)
        j = o_i + w_ramp  # [1, band]
        b_chr = _window(b_ref, o_i, band)
        a_chr = _extract_scalar(a_ref, i - 1)
        sub = (b_chr != a_chr).astype(jnp.int32)
        valid_dg = (j >= 1) & (j <= b_len)
        m = jnp.minimum(up + 1, jnp.where(valid_dg, dg + sub, INF))
        r = _prefix_min(jnp.minimum(m - w_ramp, INF), band)
        D = r + w_ramp
        D = jnp.where(j <= b_len, D, INF)

        # capture j == b_len column (cost with B fully consumed at row i)
        w_col = b_len - o_i
        in_col = (w_col >= 0) & (w_col < band)
        cost_col = jnp.where(
            in_col,
            jnp.min(jnp.where(w_ramp == w_col, D, INF)),
            jnp.int32(INF),
        )
        better = cost_col < best_bx
        best_bx = jnp.where(better, cost_col, best_bx)
        aend_bx = jnp.where(better, i, aend_bx)
        return (D, o_i, best_bx, aend_bx)

    Dfin, o_last, best_bx, aend_bx = jax.lax.fori_loop(
        1, a_len + 1, body, (D0, jnp.int32(0), best0, jnp.int32(0))
    )

    # A-exhausted: best cell of the final row
    j_fin = o_last + w_ramp
    Dfin = jnp.where(j_fin <= b_len, Dfin, INF)
    cost_ax = jnp.min(Dfin)
    wbest = jnp.min(jnp.where(Dfin == cost_ax, w_ramp, INF))  # first min lane
    use_ax = cost_ax <= best_bx
    edits = jnp.where(use_ax, cost_ax, best_bx)
    a_used = jnp.where(use_ax, a_len, aend_bx)
    b_used = jnp.where(use_ax, o_last + wbest, b_len)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out = jnp.where(lane == 0, edits, jnp.where(lane == 1, a_used, jnp.where(lane == 2, b_used, 0)))
    out_ref[0, :, :] = out


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("band", "n_rows", "interpret"))
def banded_extend_pallas(
    a: jax.Array,  # uint8[B, LA]
    a_len: jax.Array,  # int32[B]
    b: jax.Array,  # uint8[B, LB]
    b_len: jax.Array,  # int32[B]
    centers: jax.Array,  # int32[B, n_rows+1]
    band: int,
    n_rows: int,
    interpret: bool = False,
):
    """Drop-in equivalent of canu_tpu.ops.align.banded_extend.

    Returns (edits, a_used, b_used) int32[B].  The band-start schedule is
    slope-clamped to SMAX per row (anchors are dense enough that the band
    catches up within a few rows after a large indel jump).
    """
    assert band % 128 == 0 and band >= 128
    B = a.shape[0]
    # band starts: clamped into [0, b_len], monotonic, slope <= SMAX
    o_all = jnp.clip(centers - band // 2, 0, jnp.maximum(b_len, 0)[:, None])
    o_all = jax.lax.associative_scan(jnp.maximum, o_all, axis=1)
    # slope clamp: o'_i = min(o_i, o'_{i-1} + SMAX) == SMAX*i + cummin(o_j - SMAX*j)
    ramp = SMAX * jnp.arange(o_all.shape[1], dtype=jnp.int32)[None, :]
    o_all = jax.lax.associative_scan(jnp.minimum, o_all - ramp, axis=1) + ramp

    n_rows_pad = _round_up(n_rows + 1, LANE)
    o_pad = jnp.pad(o_all, ((0, 0), (0, n_rows_pad - o_all.shape[1])), mode="edge").astype(jnp.int32)
    LA = _round_up(max(a.shape[1], LANE), LANE)
    a_pad = jnp.pad(a.astype(jnp.int32), ((0, 0), (0, LA - a.shape[1])))
    # b shifted right by one with sentinel -1; padded so the aligned
    # (band+LANE)-wide window at any o_i <= b_len stays in range
    LBp = _round_up(b.shape[1] + band + 1 + 2 * LANE, LANE)
    b_shift = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), b.astype(jnp.int32)], axis=1
    )
    b_pad = jnp.pad(b_shift, ((0, 0), (0, LBp - b_shift.shape[1])), constant_values=-1)

    # [B, 1, W] layout: block (1, 1, W) satisfies the TPU tiling rule
    # (block dims equal the overall trailing dims); read lengths ride as
    # scalar-prefetch SMEM arrays indexed by program_id
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, n_rows_pad), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LA), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LBp), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 128), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        partial(_extend_kernel, band=band),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, 128), jnp.int32),
        interpret=interpret,
    )(
        a_len.astype(jnp.int32),
        b_len.astype(jnp.int32),
        o_pad[:, None, :],
        a_pad[:, None, :],
        b_pad[:, None, :],
    )
    return out[:, 0, 0], out[:, 0, 1], out[:, 0, 2]
