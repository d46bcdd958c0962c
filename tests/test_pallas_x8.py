"""8-pair Pallas kernel vs XLA reference (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from canu_tpu.ops.align import banded_extend
from canu_tpu.ops.pallas.extend_x8 import banded_extend_pallas_x8
from canu_tpu.sim.simulate import mutate_read


def _run_both(a_list, b_list, band=128):
    B = len(a_list)
    assert B % 8 == 0
    n_rows = max(max(len(a) for a in a_list), 8)
    L = max(n_rows, max(len(b) for b in b_list)) + band
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
        c[i, : len(aa) + 1] = np.round(np.linspace(0, len(bb), len(aa) + 1)).astype(np.int32)
        c[i, len(aa) + 1 :] = len(bb)
    args = (jnp.asarray(a), jnp.asarray(al), jnp.asarray(b), jnp.asarray(bl), jnp.asarray(c))
    ref = banded_extend(*args, band, n_rows)
    x8 = banded_extend_pallas_x8(*args, band, n_rows, interpret=True)
    return [np.asarray(x) for x in ref], [np.asarray(x) for x in x8]


def test_x8_matches_xla_mixed_group():
    rng = np.random.default_rng(0)
    a_list, b_list = [], []
    # mixed lengths and cases within one group of 8
    x = rng.integers(0, 4, 300).astype(np.uint8)
    a_list.append(x); b_list.append(x.copy())                      # exact
    a_list.append(x[:150]); b_list.append(x.copy())                # prefix
    a_list.append(x.copy()); b_list.append(x[:150].copy())         # b shorter
    y = rng.integers(0, 4, 250).astype(np.uint8)
    a_list.append(y); b_list.append(mutate_read(y, 0.12, rng))     # noisy
    a_list.append(rng.integers(0, 4, 64).astype(np.uint8))
    b_list.append(rng.integers(0, 4, 80).astype(np.uint8))         # unrelated short
    z = rng.integers(0, 4, 411).astype(np.uint8)
    a_list.append(z); b_list.append(mutate_read(z, 0.05, rng))     # longest
    a_list.append(np.zeros(0, np.uint8)); b_list.append(x[:40].copy())  # empty A
    a_list.append(x[:40].copy()); b_list.append(np.zeros(0, np.uint8))  # empty B
    ref, x8 = _run_both(a_list, b_list, band=128)
    for r, p in zip(ref, x8):
        np.testing.assert_array_equal(r, p)


def test_x8_two_groups_refill_path():
    rng = np.random.default_rng(3)
    a_list, b_list = [], []
    for i in range(16):
        # long enough to force several window refills (> 32 rows, drift)
        n = int(rng.integers(150, 400))
        t = rng.integers(0, 4, n).astype(np.uint8)
        a_list.append(t)
        b_list.append(mutate_read(t, 0.10, rng))
    ref, x8 = _run_both(a_list, b_list, band=128)
    for r, p in zip(ref, x8):
        np.testing.assert_array_equal(r, p)
