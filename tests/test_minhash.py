import pytest
import numpy as np

from canu_tpu.ops import kmer as K
from canu_tpu.ops import minhash as MH
from canu_tpu.stores.readset import ReadSet
from canu_tpu.sim.simulate import random_genome, simulate_reads, true_overlaps
from canu_tpu.utils import bitpack


def test_sketch_identical_reads_agree():
    g = random_genome(4000, seed=0)
    seq = bitpack.codes_to_seq(g[:2000])
    rs = ReadSet.from_sequences([seq, seq, bitpack.codes_to_seq(g[2000:])])
    sk = MH.build_sketches(rs, k=16, n_hashes=64, block_size=4)
    assert sk.shape == (3, 64)
    # identical reads: all slots agree
    assert (sk[0] == sk[1]).all()
    # disjoint sequence: few slots agree
    assert (sk[0] == sk[2]).sum() < 5


def test_find_candidates_pairs():
    g = random_genome(3000, seed=1)
    a = bitpack.codes_to_seq(g[:2000])
    b = bitpack.codes_to_seq(g[1000:3000])  # overlaps a by 1000
    c = bitpack.codes_to_seq(random_genome(2000, seed=99))
    rs = ReadSet.from_sequences([a, b, c])
    sk = MH.build_sketches(rs, k=16, n_hashes=128, block_size=4)
    cand = MH.find_candidates(sk, min_matches=3, block_size=2)  # force cross-block path
    pairs = {(int(r[0]), int(r[1])) for r in cand}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_placement_forward_and_flipped():
    g = random_genome(6000, seed=2)
    a = bitpack.codes_to_seq(g[:4000])
    b_fwd = bitpack.codes_to_seq(g[1500:5500])
    b_rc = bitpack.codes_to_seq(bitpack.revcomp_codes(g[1500:5500]))
    rs = ReadSet.from_sequences([a, b_fwd, b_rc])
    pairs = np.array([[1, 2, 0], [1, 3, 0]], dtype=np.int64)
    cand = MH.place_candidates(rs, pairs, k=16, min_shared=4, chunk=4)
    assert len(cand) == 2
    i_fwd = int(np.flatnonzero(cand.b_id == 2)[0])
    i_rc = int(np.flatnonzero(cand.b_id == 3)[0])
    assert not cand.flipped[i_fwd]
    assert cand.flipped[i_rc]
    # b starts at position 1500 of a => diag 1500 (exact reads)
    assert cand.diag[i_fwd] == 1500
    assert cand.diag[i_rc] == 1500
    # spans: overlap covers a[1500:4000]
    assert cand.a_lo[i_fwd] <= 1520 and cand.a_hi[i_fwd] >= 3950
    # b overlap region is b[0:2500] forward; for rc read it is the tail
    assert cand.b_lo[i_fwd] <= 20 and abs(int(cand.b_hi[i_fwd]) - 2500) <= 20
    assert cand.b_lo[i_rc] >= 1480 and cand.b_hi[i_rc] >= 3950


@pytest.mark.slow
def test_candidate_recall_on_simulated_reads():
    g = random_genome(30_000, seed=3)
    rs, truth = simulate_reads(
        g, coverage=8, mean_len=3000, min_len=800, error_rate=0.10, seed=4, circular=False
    )
    kc = K.count_readset_device(rs, k=16, block_size=64)
    fk = K.frequent_kmers(kc, distinct_fraction=0.9995)
    # raw-read sensitivity needs many hashes: J ~ 0.006 for a 1 kb overlap
    # at 10% error, so H=512 gives E[matches] ~ 3 (the reference's MHAP
    # normal/high presets use 256-768 — OverlapMhap.pm:109-132)
    sk = MH.build_sketches(rs, k=16, n_hashes=512, frequent=fk, block_size=64)
    cand = MH.find_candidates(sk, min_matches=2, block_size=64)
    placed = MH.place_candidates(rs, cand, k=16, frequent=fk, min_shared=4, chunk=64)

    truth_pairs = true_overlaps(truth, min_overlap=1000)
    tset = {(int(a), int(b)) for a, b, _ in truth_pairs}
    pset = {(int(a), int(b)) for a, b in zip(placed.a_id, placed.b_id)}
    found = len(tset & pset)
    recall = found / max(1, len(tset))
    precision = len(tset & pset) / max(1, len(pset & tset | (pset - tset)))
    # noisy 10% reads, 1kb+ true overlap: expect decent recall, high precision
    assert recall >= 0.7, f"recall {recall:.2f} ({found}/{len(tset)})"
    # precision against >=500bp truth (shorter true overlaps may legitimately appear)
    tset500 = {(int(a), int(b)) for a, b, _ in true_overlaps(truth, min_overlap=300)}
    fp = pset - tset500
    assert len(fp) <= 0.1 * max(1, len(pset)), f"{len(fp)} false positives of {len(pset)}"


def test_join_candidates_equal_block():
    """find_candidates_join (LSH hash-join, the 140 Mb-scale path) must
    return the EXACT same (a, b, slot_matches) rows as the block x block
    device compare."""
    import numpy as np

    from canu_tpu.ops import kmer as K
    from canu_tpu.ops import minhash as MH
    from canu_tpu.sim.simulate import random_genome, simulate_reads

    g = random_genome(40_000, seed=21)
    rs, _ = simulate_reads(g, coverage=6, mean_len=2500, min_len=1500,
                           max_len=4000, error_rate=0.06, seed=22,
                           circular=False)
    kc = K.count_readset_device(rs, k=16, block_size=256)
    fk = K.frequent_kmers(kc, distinct_fraction=0.9995)
    sk = np.asarray(MH.build_sketches(rs, k=16, n_hashes=128, frequent=fk,
                                      block_size=128))
    for mm in (2, 3):
        a = MH.find_candidates(sk, min_matches=mm, block_size=128)
        b = MH.find_candidates_join(sk, min_matches=mm)
        assert np.array_equal(a, b), (mm, len(a), len(b))
    assert len(MH.find_candidates_join(sk[:1], min_matches=2)) == 0
