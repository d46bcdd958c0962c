"""Root-cause harness for the bogus identity ruler at mega-base scale.

VERDICT r4 weak #5 / next #6: the banded ruler reported ~0.48 on
provably near-exact mega-base segments during the 12 Mb yeast run; the
jump-split fix (commit baa7391) recovered 0.9986 but the underlying
mechanism was not isolated.  This script measures the ruler on
KNOWN-EXACT synthetic placements at 1-10 Mb so every deviation from
1.0 is the ruler's own error:

  A. exact forward contig  (identity must be ~1.0)
  B. exact reverse-complement contig  (~1.0)
  C. contig with one 700-base structural deletion (repeat collapse):
     the band cannot traverse the diagonal jump; jump-split must charge
     exactly ~700 edits -> identity ~ 1 - 700/L
  D. contig with 20 scattered 2 kb collapses (yeast-like shape)
  E. contig with point errors at 1e-4 (consensus-like)  -> ~0.9999

Usage: python scripts/ruler_check.py [length] (default 10_000_000)
Run on CPU: JAX_PLATFORMS=cpu (the ruler is the assembler's own verify
kernel; CPU is exact, just slower).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    L = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    from canu_tpu.sim.bogus import evaluate_assembly
    from canu_tpu.sim.simulate import random_genome
    from canu_tpu.utils.bitpack import revcomp_codes

    g = random_genome(L, seed=99)
    rng = np.random.default_rng(5)

    def run(name, contig, expect_lo, expect_hi=1.0):
        t0 = time.time()
        ev = evaluate_assembly(g, [contig], k=21, circular=False)
        ident = ev.identity
        ok = expect_lo <= ident <= expect_hi
        print(
            f"{name}: identity={ident:.6f} expect=[{expect_lo:.6f},"
            f"{expect_hi:.6f}] {'OK' if ok else 'FAIL'} "
            f"({time.time()-t0:.1f}s, misjoins={ev.n_misjoins})",
            flush=True,
        )
        return ok

    ok = True
    # A: exact forward
    ok &= run("A exact-forward", g.copy(), 0.9999)
    # B: exact reverse-complement
    ok &= run("B exact-revcomp", revcomp_codes(g), 0.9999)
    # C: one 700-base structural deletion in the middle
    c = np.concatenate([g[: L // 2], g[L // 2 + 700 :]])
    exp = 1.0 - 700.0 / L
    ok &= run("C one-700bp-collapse", c, exp - 3000.0 / L, exp + 300.0 / L)
    # D: 20 scattered 2 kb collapses
    cuts = np.sort(rng.choice(np.arange(L // 20, L - L // 20), 20, replace=False))
    pieces, prev = [], 0
    for p in cuts.tolist():
        pieces.append(g[prev:p])
        prev = p + 2000
    pieces.append(g[prev:])
    d = np.concatenate(pieces)
    exp = 1.0 - 40000.0 / L
    ok &= run("D 20x2kb-collapses", d, exp - 60000.0 / L, exp + 5000.0 / L)
    # E: point errors at 1e-4
    e = g.copy()
    pos = rng.choice(L, L // 10000, replace=False)
    e[pos] = (e[pos] + rng.integers(1, 4, len(pos))) % 4
    ok &= run("E point-1e-4", e, 0.99975, 0.99995)
    print("RULER_CHECK_" + ("PASS" if ok else "FAIL"), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
