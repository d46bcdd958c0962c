"""DAG / tag-chain consensus (cnsConsensus=dag, ops/dagcon.py).

The two pile shapes per-column plurality structurally cannot call
(reference solves both with the pbdagcon alignment graph,
/root/reference/src/utgcns/libpbutgcns/AlnGraphBoost.C):

  * insertions longer than the vote format's two per-column slots;
  * mixed-haplotype piles, where the output must follow ONE consistent
    chain instead of mixing per-column winners.
"""

import numpy as np
import pytest

from canu_tpu.ops.consensus import polish_tig
from canu_tpu.sim.simulate import random_genome
from canu_tpu.stores.readset import ReadSet
from canu_tpu.stores.tigs import Tig
from canu_tpu.utils import bitpack


def _tiled_reads(hap: np.ndarray, start0: int, step: int, rlen: int):
    """Error-free reads tiling `hap`, alternating orientation.
    Returns (codes_list, placements [s, e, rev])."""
    reads, place = [], []
    s = start0
    i = 0
    while s + rlen <= len(hap):
        sl = hap[s : s + rlen]
        rev = bool(i % 2)
        reads.append(bitpack.revcomp_codes(sl) if rev else sl.copy())
        place.append((s, s + rlen, rev))
        s += step
        i += 1
    return reads, place


def _pile(genome_a: np.ndarray, haps: list[np.ndarray], offsets: list[int]):
    """Build a ReadSet + Tig from reads tiled over each haplotype
    (placements in genome_a coordinates — hang estimates, like real
    unitig layouts)."""
    codes, place = [], []
    for hap, off in zip(haps, offsets):
        # step 600 / length 1500 -> depth >= 2 everywhere interior (the
        # polish min_cov gate keeps template bases below that)
        c, p = _tiled_reads(hap, off, 600, 1500)
        codes.extend(c)
        place.extend(p)
    rs = ReadSet.from_codes_list(codes)
    order = np.argsort([p[0] for p in place], kind="stable")
    tig = Tig(
        tig_id=1,
        read_id=np.array([int(i) + 1 for i in order], np.int32),
        bgn=np.array([place[i][0] for i in order], np.int32),
        end=np.array([min(place[i][1], len(genome_a)) for i in order], np.int32),
        rev=np.array([place[i][2] for i in order], bool),
    )
    return rs, tig


def _mid(hap: np.ndarray, lo: int, hi: int) -> str:
    return bitpack.codes_to_seq(hap[lo:hi])


@pytest.fixture(scope="module")
def two_haps():
    ga = random_genome(6000, seed=91)
    # hap B: 5-base insertion at 3000 plus SNPs at 2970 and 3040 —
    # a variant cluster no single column vote can represent
    ins = np.array([0, 2, 1, 3, 0], np.uint8)
    gb = ga.copy()
    gb[2970] = (gb[2970] + 1) % 4
    gb[3040] = (gb[3040] + 2) % 4
    gb = np.concatenate([gb[:3000], ins, gb[3000:]])
    return ga, gb


@pytest.mark.slow
def test_dag_recovers_long_insertion(two_haps):
    """Uniform pile: every read carries a 5-base insertion plus two SNPs
    the backbone lacks; the tag chain emits the whole variant cluster in
    one round."""
    ga, gb = two_haps
    rs, tig = _pile(ga, [gb], [0])
    want = _mid(gb, 2700, 3300)

    dag = polish_tig(rs, tig, ga.copy(), band=256, min_cov=2, rounds=1,
                     mode="dag")
    assert want in bitpack.codes_to_seq(dag)


def test_dag_mixed_pile_follows_one_chain(two_haps):
    """Mixed pile, hap B locally ~5x vs hap A ~3x: the DAG must emit
    hap B's variant cluster as ONE consistent chain (never a per-column
    mixture of the two haplotypes)."""
    ga, gb = two_haps
    rs, tig = _pile(ga, [gb, gb, ga], [0, 300, 450])
    want_b = _mid(gb, 2700, 3300)
    want_a = _mid(ga, 2700, 3300)

    dag = polish_tig(rs, tig, ga.copy(), band=256, min_cov=2, rounds=1,
                     mode="dag")
    sd = bitpack.codes_to_seq(dag)
    assert want_b in sd and want_a not in sd


@pytest.mark.slow
def test_dag_matches_plurality_on_clean_pile():
    """No-regression: on an unambiguous pile (uniform haplotype,
    substitution-corrupted backbone) both engines restore the genome."""
    g = random_genome(5000, seed=93)
    rs, tig = _pile(g, [g], [0])
    bad = g.copy()
    rng = np.random.default_rng(5)
    pos = rng.choice(np.arange(500, 4500), size=40, replace=False)
    bad[pos] = (bad[pos] + 1 + rng.integers(0, 3, size=40)) % 4
    want = _mid(g, 700, 3800)
    for mode in ("dag", "plurality"):
        out = polish_tig(rs, tig, bad.copy(), band=256, min_cov=2,
                         rounds=1, mode=mode)
        assert want in bitpack.codes_to_seq(out), mode
