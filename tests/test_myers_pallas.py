"""Pallas Myers kernel vs the XLA-scan reference: bit-identical results.

Runs the Pallas TPU kernel in interpret mode on CPU (small shapes —
the interpreter executes every ref op individually) and compares every
output against the XLA implementation, including partial-overlap
endpoints.  On real TPU the same comparison runs at full scale (see
scripts/ and BASELINE.md for measured numbers).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from canu_tpu.ops.myers import banded_extend_myers


def _mutate(rng, seq, er):
    out = []
    for c in seq:
        r = rng.random()
        if r < er * 0.4:
            continue
        elif r < er * 0.7:
            out += [int(c), int(rng.integers(0, 4))]
        elif r < er:
            out.append(int((c + 1 + rng.integers(0, 3)) % 4))
        else:
            out.append(int(c))
    return np.array(out, np.uint8)


@pytest.mark.parametrize("er", [0.05, 0.2])
@pytest.mark.slow
def test_pallas_matches_xla(er):
    rng = np.random.default_rng(int(er * 100))
    B, LA, LB, n_rows = 5, 150, 160, 128
    A = np.zeros((B, n_rows), np.uint8)
    Bb = np.zeros((B, LB + 128), np.uint8)
    a_len = np.zeros(B, np.int32)
    b_len = np.zeros(B, np.int32)
    for i in range(B):
        base = rng.integers(0, 4, LA).astype(np.uint8)
        mb = _mutate(rng, base, er)[:LB]
        a_len[i] = min(LA, n_rows)
        b_len[i] = len(mb)
        A[i, : a_len[i]] = base[: a_len[i]]
        Bb[i, : len(mb)] = mb
    # degenerate rows: empty A, empty B
    a_len[B - 1] = 0
    b_len[B - 2] = 0
    centers = np.arange(n_rows + 1, dtype=np.int32)[None, :].repeat(B, 0)

    args = (
        jnp.asarray(A), jnp.asarray(a_len), jnp.asarray(Bb),
        jnp.asarray(b_len), jnp.asarray(centers),
    )
    r_xla = banded_extend_myers(*args, 128, n_rows, partial_cap_q=1500,
                                impl="xla")
    r_pal = banded_extend_myers(*args, 128, n_rows, partial_cap_q=1500,
                                impl="pallas_interpret")
    names = ("edits", "a_used", "b_used", "p_edits", "p_a", "p_b")
    for name, x, p in zip(names, r_xla, r_pal):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(p), err_msg=f"{name} mismatch"
        )
