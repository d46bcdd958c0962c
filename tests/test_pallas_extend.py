"""Pallas extension kernel vs the XLA reference implementation.

Runs in interpret mode on CPU (tiny shapes); the TPU-compiled path is
exercised by bench.py and the verify drives.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from canu_tpu.ops.align import banded_extend
from canu_tpu.ops.pallas.extend import banded_extend_pallas
from canu_tpu.sim.simulate import mutate_read


def _run_both(a_list, b_list, band=128, centers_slope=None):
    B = len(a_list)
    n_rows = max(len(a) for a in a_list)
    L = max(max(len(a) for a in a_list), max(len(b) for b in b_list)) + band
    a = np.zeros((B, L), np.uint8)
    b = np.zeros((B, L), np.uint8)
    al = np.zeros(B, np.int32)
    bl = np.zeros(B, np.int32)
    c = np.zeros((B, n_rows + 1), np.int32)
    for i, (aa, bb) in enumerate(zip(a_list, b_list)):
        a[i, : len(aa)] = aa
        b[i, : len(bb)] = bb
        al[i] = len(aa)
        bl[i] = len(bb)
        # band must follow the diagonal: straight-line centers to b's end
        c[i] = np.round(np.linspace(0, len(bb), n_rows + 1)).astype(np.int32)
    args = (jnp.asarray(a), jnp.asarray(al), jnp.asarray(b), jnp.asarray(bl), jnp.asarray(c))
    ref = banded_extend(*args, band, n_rows)
    pal = banded_extend_pallas(*args, band, n_rows, interpret=True)
    return [np.asarray(x) for x in ref], [np.asarray(x) for x in pal]


def test_pallas_matches_xla_exact_and_noisy():
    rng = np.random.default_rng(0)
    a_list, b_list = [], []
    # exact pair
    x = rng.integers(0, 4, 300).astype(np.uint8)
    a_list.append(x)
    b_list.append(x.copy())
    # prefix pair
    a_list.append(x[:150])
    b_list.append(x.copy())
    # noisy pair
    y = rng.integers(0, 4, 250).astype(np.uint8)
    a_list.append(y)
    b_list.append(mutate_read(y, 0.12, rng))
    # unrelated pair
    a_list.append(rng.integers(0, 4, 200).astype(np.uint8))
    b_list.append(rng.integers(0, 4, 220).astype(np.uint8))
    ref, pal = _run_both(a_list, b_list, band=128)
    for r, p in zip(ref, pal):
        np.testing.assert_array_equal(r, p)
    # sanity on the exact pair
    assert ref[0][0] == 0 and ref[1][0] == 300 and ref[2][0] == 300


def test_pallas_matches_xla_with_centers():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 4, 500).astype(np.uint8)
    y = mutate_read(x, 0.08, rng)
    ref, pal = _run_both([x], [y], band=128, centers_slope=True)
    for r, p in zip(ref, pal):
        np.testing.assert_array_equal(r, p)
    assert 10 < ref[0][0] < 120  # ~8% edits


def test_pallas_empty_a():
    rng = np.random.default_rng(4)
    b = rng.integers(0, 4, 50).astype(np.uint8)
    ref, pal = _run_both([np.zeros(0, np.uint8)], [b], band=128)
    for r, p in zip(ref, pal):
        np.testing.assert_array_equal(r, p)
    # empty A: B-exhausted costs b_len, A-exhausted costs 0 -> picks 0 edits
    assert ref[0][0] == 0 and ref[2][0] == 0
