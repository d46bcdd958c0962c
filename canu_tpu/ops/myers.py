"""Myers bit-vector banded extension — the speed-of-light verify kernel.

Replaces the per-row select/roll DP of ops.align.banded_extend and the
x8 Pallas kernel with Myers' bit-parallel algorithm (Myers 1999, the
same algorithm family as the reference's vendored edlib,
/root/reference/src/overlapInCore/libedlib/edlib.C), re-shaped for the
TPU VPU:

  * ONE PAIR PER LANE: every quantity is a plain elementwise uint32 op,
    so a [B]-wide batch uses the full 8x128-lane VPU with zero cross-lane
    traffic (no rolls, no per-sublane selects, no gathers in the loop);
  * the 128-column band is 4 uint32 words per pair; words are chained
    exactly like edlib's blocks: only a +/-1 horizontal delta (hin/hout)
    crosses a word boundary, so the 128-bit add never materializes;
  * 128 DP cells update in ~25 bit-ops per word chain — ~0.1 vector op
    per DP cell versus ~1 op per cell for the select/roll kernel;
  * the band follows the anchor chain like banded_extend, but with a
    slope clamp of 1 column/row (a shift is then a single conditional
    word-chain >>1 with a per-lane bit insert — again elementwise);
  * scores are never materialized: the window-top score rides along as
    an integer (score_first), any in-window column value is
    score_first + popcount-prefix of the VP/VN planes, and the final
    A-exhausted row is unpacked once, outside the loop.

Semantics match banded_extend (extension from (0,0) until either read
is exhausted, returning (edits, a_used, b_used)); cells outside the
band behave as +1-per-row walls (edlib's banded boundary condition)
instead of banded_extend's hard INF, which can only differ when the
optimal path leaves the band — where both kernels are already
band-limited approximations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

INF = 1 << 28
WORD = 32
NW = 4  # words per band: band == 128


def _band_schedule(centers: jax.Array, b_len: jax.Array, band: int) -> jax.Array:
    """Band start o(i) per row: centered on the anchor chain, clamped to
    [0, b_len], monotonic, slope <= 1 column/row (so a window shift is a
    1-bit operation).  Mirrors banded_extend's schedule with SMAX=1."""
    o = jnp.clip(centers - band // 2, 0, jnp.maximum(b_len, 0)[:, None])
    o = jax.lax.associative_scan(jnp.maximum, o, axis=1)
    ramp = jnp.arange(o.shape[1], dtype=jnp.int32)[None, :]
    o = jax.lax.associative_scan(jnp.minimum, o - ramp, axis=1) + ramp
    return o


def _pack_bits(bits: jax.Array) -> jax.Array:
    """bool[B, NW*32] -> uint32[B, NW] (bit u of word k = bits[:, 32k+u])."""
    B = bits.shape[0]
    b3 = bits.reshape(B, NW, WORD).astype(jnp.uint32)
    sh = jnp.arange(WORD, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(b3 << sh, axis=2, dtype=jnp.uint32)


def _unpack_bits(words: jax.Array) -> jax.Array:
    """uint32[B, NW] -> int32[B, NW*32]."""
    B = words.shape[0]
    sh = jnp.arange(WORD, dtype=jnp.uint32)[None, None, :]
    bits = (words[:, :, None] >> sh) & jnp.uint32(1)
    return bits.reshape(B, NW * WORD).astype(jnp.int32)


def _prefix_mask(w: jax.Array) -> jax.Array:
    """uint32[B, NW] with the low `w` bits set (w in [0, 128])."""
    m = jnp.clip(w[:, None] - jnp.arange(NW, dtype=jnp.int32)[None, :] * WORD, 0, WORD)
    # (1 << 32) wraps to 0 in XLA, and 0 - 1 underflows to all-ones: exact
    return (jnp.uint32(1) << m.astype(jnp.uint32)) - jnp.uint32(1)


def _masked_score(VP, VN, sf, w):
    """D(window offset w) = score_first + popcount-prefix over w bits."""
    mask = _prefix_mask(w)
    pv = jnp.sum(jax.lax.population_count(VP & mask), axis=1, dtype=jnp.int32)
    mv = jnp.sum(jax.lax.population_count(VN & mask), axis=1, dtype=jnp.int32)
    return sf + pv - mv


def _shift_chain(X: jax.Array, ins: jax.Array) -> jax.Array:
    """Word-chain >>1 (window moves down one column); `ins` enters bit 127."""
    hi = jnp.concatenate(
        [X[:, 1:], (ins.astype(jnp.uint32) << jnp.uint32(0))[:, None]], axis=1
    )
    return (X >> jnp.uint32(1)) | (hi << jnp.uint32(31))


@partial(jax.jit, static_argnames=("band", "n_rows"))
def banded_extend_myers(
    a: jax.Array,  # uint8[B, LA] (row 0 = first char to align)
    a_len: jax.Array,  # int32[B]
    b: jax.Array,  # uint8[B, LB]
    b_len: jax.Array,  # int32[B]
    centers: jax.Array,  # int32[B, n_rows+1]
    band: int = 128,
    n_rows: int = 0,
):
    """Drop-in equivalent of banded_extend (band must be 128)."""
    assert band == NW * WORD, "Myers kernel is specialized to band=128"
    B, LB = b.shape[0], b.shape[1]
    a_len = a_len.astype(jnp.int32)
    b_len = b_len.astype(jnp.int32)

    o_all = _band_schedule(centers.astype(jnp.int32), b_len, band)  # [B, n_rows+1]

    # ---- per-step streams (time-major) -----------------------------------
    steps = jnp.arange(1, n_rows + 1, dtype=jnp.int32)
    s_step = (o_all[:, 1 : n_rows + 1] - o_all[:, :n_rows]).astype(jnp.uint8).T
    a_ch = a[:, :n_rows].astype(jnp.uint8).T  # a char of row i = a[i-1]
    # char entering the window at bit 127 when the window shifts to o_i:
    # column j = o_i + 128 compares b[j-1] = b[o_i + 127]
    ent_idx = jnp.clip(o_all[:, 1 : n_rows + 1] + (band - 1), 0, LB - 1)
    b_in_ch = jnp.take_along_axis(b, ent_idx, axis=1).astype(jnp.uint8).T

    # ---- initial state (row 0, window at o0) -----------------------------
    o0 = o_all[:, 0]
    # D(0, j) = j: every vertical delta +1
    VP0 = jnp.full((B, NW), 0xFFFFFFFF, jnp.uint32)
    VN0 = jnp.zeros((B, NW), jnp.uint32)
    sf0 = o0  # D(0, o0) = o0
    # Peq bit u of word k <-> column j = o + 32k + u + 1, char b[j-1]
    pos0 = o0[:, None] + jnp.arange(band, dtype=jnp.int32)[None, :]  # b index
    bch0 = jnp.take_along_axis(b, jnp.clip(pos0, 0, LB - 1), axis=1)
    Peq0 = jnp.stack(
        [_pack_bits((bch0 == c) & (pos0 < LB)) for c in range(4)], axis=1
    )  # [B, 4, NW]

    # row-0 B-exhaustion (b_len inside the initial window)
    wb0 = b_len - o0
    in0 = (wb0 >= 0) & (wb0 < band)
    best_bx0 = jnp.where(in0, _masked_score(VP0, VN0, sf0, jnp.maximum(wb0, 0)), INF)
    # row-0 A-exhaustion capture (a_len == 0)
    fin0 = (a_len == 0)
    cap = lambda live, new, old: jnp.where(live[:, None] if new.ndim == 2 else live, new, old)

    carry0 = dict(
        VP=VP0, VN=VN0, Peq=Peq0, sf=sf0, o=o0,
        best_bx=best_bx0,
        aend_bx=jnp.zeros(B, jnp.int32),
        bend_bx=jnp.where(in0, b_len, 0),
        finVP=jnp.where(fin0[:, None], VP0, 0),
        finVN=jnp.where(fin0[:, None], VN0, 0),
        fin_sf=jnp.where(fin0, sf0, 0),
        fin_o=jnp.where(fin0, o0, 0),
    )

    ones = jnp.uint32(1)
    top = jnp.uint32(0x80000000)

    def step(carry, xs):
        s, ach, bch, i = xs
        live = i <= carry["a_len"] if False else (i <= a_len)  # [B]
        s = jnp.where(live, s.astype(jnp.int32), 0)
        do_shift = s > 0

        VP, VN, Peq, sf, o = carry["VP"], carry["VN"], carry["Peq"], carry["sf"], carry["o"]

        # ---- window shift (elementwise; per-lane condition) ----
        sf_sh = sf + (VP[:, 0] & ones).astype(jnp.int32) - (VN[:, 0] & ones).astype(jnp.int32)
        VP_sh = _shift_chain(VP, jnp.ones(B, jnp.uint32))  # below-band wall: +1
        VN_sh = _shift_chain(VN, jnp.zeros(B, jnp.uint32))
        ins = jnp.stack([(bch.astype(jnp.int32) == c) for c in range(4)], 1)  # [B,4]
        Peq_sh = jnp.stack(
            [_shift_chain(Peq[:, c], ins[:, c].astype(jnp.uint32)) for c in range(4)],
            axis=1,
        )
        VP = jnp.where(do_shift[:, None], VP_sh, VP)
        VN = jnp.where(do_shift[:, None], VN_sh, VN)
        Peq = jnp.where(do_shift[:, None, None], Peq_sh, Peq)
        sf = jnp.where(do_shift, sf_sh, sf)
        o = o + s

        # ---- Myers column update (edlib calculateBlock chained) ----
        sel = ach.astype(jnp.int32)
        Eq_all = (
            jnp.where((sel == 0)[:, None], Peq[:, 0], 0)
            | jnp.where((sel == 1)[:, None], Peq[:, 1], 0)
            | jnp.where((sel == 2)[:, None], Peq[:, 2], 0)
            | jnp.where((sel == 3)[:, None], Peq[:, 3], 0)
        )  # [B, NW]
        # boundary row (window top) grows +1/row: hin = +1 into word 0
        hp_in = jnp.ones(B, jnp.uint32)
        hm_in = jnp.zeros(B, jnp.uint32)
        nVP, nVN = [], []
        for k in range(NW):
            Pv, Mv = VP[:, k], VN[:, k]
            Xv = Eq_all[:, k] | Mv
            Eq = Eq_all[:, k] | hm_in  # hin<0 sets Eq bit 0
            Xh = ((Eq & Pv) + Pv ^ Pv) | Eq
            Ph = Mv | ~(Xh | Pv)
            Mh = Pv & Xh
            hp_out = (Ph & top) >> jnp.uint32(31)
            hm_out = (Mh & top) >> jnp.uint32(31)
            Ph = (Ph << ones) | hp_in
            Mh = (Mh << ones) | hm_in
            nVP.append(Mh | ~(Xv | Ph))
            nVN.append(Ph & Xv)
            hp_in, hm_in = hp_out, hm_out
        VP_new = jnp.stack(nVP, axis=1)
        VN_new = jnp.stack(nVN, axis=1)
        sf_new = sf + 1  # boundary wall grows +1 per row

        VP = jnp.where(live[:, None], VP_new, VP)
        VN = jnp.where(live[:, None], VN_new, VN)
        sf = jnp.where(live, sf_new, sf)

        # ---- B-exhaustion capture: column j == b_len in-window ----
        wb = b_len - o
        inw = (wb >= 0) & (wb < band) & live
        cost = jnp.where(inw, _masked_score(VP, VN, sf, jnp.clip(wb, 0, band)), INF)
        better = cost < carry["best_bx"]
        best_bx = jnp.where(better, cost, carry["best_bx"])
        aend_bx = jnp.where(better, i, carry["aend_bx"])
        bend_bx = jnp.where(better, b_len, carry["bend_bx"])

        # ---- A-exhaustion capture ----
        at_fin = i == a_len
        finVP = jnp.where(at_fin[:, None], VP, carry["finVP"])
        finVN = jnp.where(at_fin[:, None], VN, carry["finVN"])
        fin_sf = jnp.where(at_fin, sf, carry["fin_sf"])
        fin_o = jnp.where(at_fin, o, carry["fin_o"])

        new = dict(
            VP=VP, VN=VN, Peq=Peq, sf=sf, o=o,
            best_bx=best_bx, aend_bx=aend_bx, bend_bx=bend_bx,
            finVP=finVP, finVN=finVN, fin_sf=fin_sf, fin_o=fin_o,
        )
        return new, None

    carry, _ = jax.lax.scan(step, carry0, (s_step, a_ch, b_in_ch, steps))

    # ---- A-exhausted row: unpack and take the best in-window column ----
    dv = _unpack_bits(carry["finVP"]) - _unpack_bits(carry["finVN"])  # [B, 128]
    pref = jnp.cumsum(dv, axis=1)
    w_ramp = jnp.arange(band, dtype=jnp.int32)[None, :]
    scores = carry["fin_sf"][:, None] + jnp.where(w_ramp == 0, 0, jnp.roll(pref, 1, axis=1))
    # D(fin row, fin_o + w); valid while the column exists on B
    j = carry["fin_o"][:, None] + w_ramp
    scores = jnp.where(j <= b_len[:, None], scores, INF)
    wbest = jnp.argmin(scores, axis=1).astype(jnp.int32)
    cost_ax = jnp.take_along_axis(scores, wbest[:, None], axis=1)[:, 0]
    bend_ax = carry["fin_o"] + wbest

    use_ax = cost_ax <= carry["best_bx"]
    edits = jnp.where(use_ax, cost_ax, carry["best_bx"])
    a_used = jnp.where(use_ax, a_len, carry["aend_bx"])
    b_used = jnp.where(use_ax, bend_ax, carry["bend_bx"])
    return edits, a_used, b_used
