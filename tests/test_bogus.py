"""Truth-harness tests: ideal assembly, UNIQ/REPT classification, and
assembly-vs-genome evaluation (bogus/bogusness equivalents)."""

import pytest
import numpy as np

from canu_tpu.sim.bogus import (
    classify_genome,
    evaluate_assembly,
    ideal_contigs,
    ng50,
)
from canu_tpu.sim.simulate import random_genome, simulate_reads
from canu_tpu.utils.bitpack import revcomp_codes


def test_classify_genome_finds_planted_repeat():
    g = random_genome(20_000, seed=5, repeat_spec=[(800, 3)])
    rept, uniq = classify_genome(g, k=21)
    # three planted copies -> >= 2kb of repeat sequence flagged
    rept_bases = int((rept[:, 1] - rept[:, 0]).sum()) if len(rept) else 0
    assert rept_bases >= 2000
    # a clean random genome has (almost) no repeats at k=21
    g2 = random_genome(20_000, seed=6)
    rept2, uniq2 = classify_genome(g2, k=21)
    rept2_bases = int((rept2[:, 1] - rept2[:, 0]).sum()) if len(rept2) else 0
    assert rept2_bases < 200
    assert uniq2[0, 0] == 0 and uniq2[-1, 1] == 20_000


def test_ideal_contigs_chain_and_gap():
    g = random_genome(30_000, seed=7)
    rs, truth = simulate_reads(
        g, coverage=10, mean_len=2000, min_len=1200, error_rate=0.05,
        seed=8, circular=False,
    )
    iv = ideal_contigs(truth, min_overlap=500)
    total = int((iv[:, 1] - iv[:, 0]).sum())
    # dense coverage: nearly the whole genome in few ideal pieces
    assert total >= 28_000
    assert len(iv) <= 4
    assert ng50(iv[:, 1] - iv[:, 0], len(g)) >= 10_000


@pytest.mark.slow
def test_evaluate_perfect_assembly():
    g = random_genome(40_000, seed=9)
    # the "assembly" = the genome split into two overlapping pieces,
    # second one reverse-complemented
    c1 = g[:22_000]
    c2 = revcomp_codes(g[20_000:])
    ev = evaluate_assembly(g, [c1, c2], k=21, circular=False)
    assert ev.n_contigs == 2 and ev.n_placed == 2
    assert ev.n_misjoins == 0
    assert ev.genome_fraction > 0.99
    assert ev.identity > 0.995
    assert 1.0 <= ev.duplication < 1.2
    rev = [p.reverse for p in ev.placements]
    assert rev == [False, True]


@pytest.mark.slow
def test_evaluate_detects_misjoin_and_errors():
    g = random_genome(40_000, seed=10)
    # chimeric contig: two distant genome segments glued together
    chim = np.concatenate([g[2_000:12_000], g[25_000:35_000]])
    ev = evaluate_assembly(g, [chim], k=21, circular=False)
    assert ev.n_misjoins == 1
    assert len(ev.placements) == 2

    # 5%-error copy of a segment: placement holds, identity drops
    from canu_tpu.sim.simulate import mutate_read

    rng = np.random.default_rng(11)
    noisy = mutate_read(g[5_000:15_000], 0.05, rng)
    ev2 = evaluate_assembly(g, [noisy], k=21, circular=False)
    assert ev2.n_placed == 1
    assert 0.90 < ev2.identity < 0.99


@pytest.mark.slow
def test_evaluate_circular_wrap():
    g = random_genome(30_000, seed=12)
    # contig spanning the origin of a circular genome
    wrap = np.concatenate([g[24_000:], g[:6_000]])
    ev = evaluate_assembly(g, [wrap], k=21, circular=True)
    assert ev.n_placed == 1
    assert ev.n_misjoins == 0
    assert ev.identity > 0.995


@pytest.mark.slow
def test_ruler_megabase_known_exact():
    """The identity ruler on KNOWN-EXACT mega-base placements (VERDICT
    r4 #6 root-cause): exact forward/revcomp must score ~1.0, and
    structural collapses must be charged exactly once — a 700-base
    repeat collapse is NOT free (pre-r5 it split into two placements and
    scored identity 1.0 with 0 misjoins: invisible)."""
    from canu_tpu.sim.bogus import evaluate_assembly
    from canu_tpu.sim.simulate import random_genome
    from canu_tpu.utils.bitpack import revcomp_codes

    L = 1_500_000
    g = random_genome(L, seed=99)
    ev = evaluate_assembly(g, [g.copy()], k=21, circular=False)
    assert ev.identity >= 0.9999 and ev.n_misjoins == 0, ev.summary()
    ev = evaluate_assembly(g, [revcomp_codes(g)], k=21, circular=False)
    assert ev.identity >= 0.9999 and ev.n_misjoins == 0, ev.summary()
    c = np.concatenate([g[: L // 2], g[L // 2 + 700 :]])
    ev = evaluate_assembly(g, [c], k=21, circular=False)
    exp = 1.0 - 700.0 / L
    assert exp - 3000.0 / L <= ev.identity <= exp + 300.0 / L, ev.summary()
    assert ev.n_misjoins == 0, ev.summary()
