import numpy as np
import jax.numpy as jnp
import pytest

from canu_tpu.ops import align as AL
from canu_tpu.ops import minhash as MH
from canu_tpu.ops import kmer as K
from canu_tpu.stores.readset import ReadSet
from canu_tpu.sim.simulate import mutate_read, random_genome, simulate_reads, true_overlaps
from canu_tpu.utils import bitpack


def brute_extend(a: np.ndarray, b: np.ndarray):
    """Reference semi-global extension: consume all of a OR all of b,
    min edits; ties -> A-exhausted, then smallest index."""
    la, lb = len(a), len(b)
    D = np.zeros((la + 1, lb + 1), dtype=np.int64)
    D[:, 0] = np.arange(la + 1)
    D[0, :] = np.arange(lb + 1)
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            D[i, j] = min(
                D[i - 1, j] + 1,
                D[i, j - 1] + 1,
                D[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
            )
    jbest = int(np.argmin(D[la, :]))
    cost_ax = int(D[la, jbest])
    ibest = int(np.argmin(D[:, lb]))
    cost_bx = int(D[ibest, lb])
    if cost_ax <= cost_bx:
        return cost_ax, la, jbest
    return cost_bx, ibest, lb


def run_extend(a_codes, b_codes, band=None, centers=None):
    la, lb = len(a_codes), len(b_codes)
    n_rows = max(la, 1)
    if band is None:
        band = lb + 8
    L = max(la, lb) + band
    a = np.zeros((1, L), np.uint8)
    b = np.zeros((1, L), np.uint8)
    a[0, :la] = a_codes
    b[0, :lb] = b_codes
    if centers is None:
        c = np.zeros((1, n_rows + 1), np.int32)  # o = 0 everywhere
    else:
        c = centers.reshape(1, -1).astype(np.int32)
    e, au, bu = AL.banded_extend(
        jnp.asarray(a), jnp.asarray(np.array([la], np.int32)),
        jnp.asarray(b), jnp.asarray(np.array([lb], np.int32)),
        jnp.asarray(c), band, n_rows,
    )
    return int(e[0]), int(au[0]), int(bu[0])


def test_extend_exact_match():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 4, 50).astype(np.uint8)
    e, au, bu = run_extend(a, a)
    assert (e, au, bu) == (0, 50, 50)


def test_extend_prefix():
    rng = np.random.default_rng(1)
    b = rng.integers(0, 4, 80).astype(np.uint8)
    a = b[:50]
    e, au, bu = run_extend(a, b)
    assert (e, au, bu) == (0, 50, 50)
    # and the other way: b exhausted
    e, au, bu = run_extend(b, b[:50])
    assert (e, au, bu) == (0, 50, 50)


@pytest.mark.parametrize("seed", [2, 3, 4, 5])
def test_extend_matches_bruteforce_full_band(seed):
    rng = np.random.default_rng(seed)
    la = int(rng.integers(20, 70))
    lb = int(rng.integers(20, 70))
    a = rng.integers(0, 4, la).astype(np.uint8)
    # related but mutated sequence
    b = mutate_read(a, 0.2, rng)[:lb]
    if len(b) < 5:
        b = rng.integers(0, 4, lb).astype(np.uint8)
    eb, aub, bub = brute_extend(a, b)
    e, au, bu = run_extend(a, b)
    assert e == eb, (e, eb)
    assert (au, bu) == (aub, bub)


def test_extend_banded_with_centers():
    # long sequences, small band, centers following the true diagonal
    rng = np.random.default_rng(7)
    a = rng.integers(0, 4, 600).astype(np.uint8)
    b = mutate_read(a, 0.08, rng)
    eb, aub, bub = brute_extend(a, b)
    centers = np.round(np.linspace(0, len(b), len(a) + 1)).astype(np.int32)
    e, au, bu = run_extend(a, b, band=64, centers=centers)
    assert e == eb
    assert (au, bu) == (aub, bub)


def _make_candidates(rs, pairs):
    cand = MH.place_candidates(rs, np.asarray(pairs, dtype=np.int64), k=16, min_shared=3, chunk=8)
    return cand


def test_verify_exact_overlap():
    g = random_genome(6000, seed=10)
    a = bitpack.codes_to_seq(g[:4000])
    b = bitpack.codes_to_seq(g[1500:5500])
    b_rc = bitpack.codes_to_seq(bitpack.revcomp_codes(g[1500:5500]))
    rs = ReadSet.from_sequences([a, b, b_rc])
    cand = _make_candidates(rs, [[1, 2, 0], [1, 3, 0]])
    ov = AL.verify_overlaps(rs, cand, band=64, min_overlap=500, chunk=8)
    assert len(ov) == 2
    for i in range(2):
        assert ov.erate_q[i] == 0
        assert ov.a_bgn[i] == 1500 and ov.a_end[i] == 4000
        bspan = (int(ov.b_bgn[i]), int(ov.b_end[i]))
        if ov.flipped[i]:
            assert bspan == (1500, 4000)  # tail of the rc read in fwd coords
        else:
            assert bspan == (0, 2500)


@pytest.mark.slow
def test_verify_noisy_overlap_erate():
    rng = np.random.default_rng(11)
    g = random_genome(8000, seed=12)
    a = g[:5000]
    b = mutate_read(g[2000:7000], 0.10, rng)  # ~10% errors on one read
    rs = ReadSet.from_codes_list([a, b])
    cand = _make_candidates(rs, [[1, 2, 0]])
    assert len(cand) == 1
    ov = AL.verify_overlaps(rs, cand, band=256, min_overlap=1000, chunk=8)
    assert len(ov) == 1
    er = float(ov.erate[0])
    assert 0.06 <= er <= 0.14, er
    # hangs: overlap on a is [2000, 5000) +- indel slack
    assert abs(int(ov.a_bgn[0]) - 2000) < 60
    assert abs(int(ov.a_end[0]) - 5000) < 60
    assert int(ov.b_bgn[0]) < 40


def test_verify_rejects_false_candidates():
    # unrelated reads with a fake candidate entry
    g1 = random_genome(3000, seed=13)
    g2 = random_genome(3000, seed=14)
    rs = ReadSet.from_codes_list([g1, g2])
    cand = MH.OverlapCandidates(
        a_id=np.array([1], np.int32),
        b_id=np.array([2], np.int32),
        flipped=np.array([False]),
        diag=np.array([0], np.int32),
        n_shared=np.array([5], np.int32),
        a_lo=np.array([0], np.int32),
        a_hi=np.array([3000], np.int32),
        b_lo=np.array([0], np.int32),
        b_hi=np.array([3000], np.int32),
    )
    ov = AL.verify_overlaps(rs, cand, band=64, max_erate=0.32, min_overlap=500, chunk=8)
    assert len(ov) == 0


@pytest.mark.slow
def test_pipeline_recall_and_precision():
    g = random_genome(20_000, seed=15)
    rs, truth = simulate_reads(
        g, coverage=8, mean_len=2500, min_len=800, error_rate=0.10, seed=16, circular=False
    )
    kc = K.count_readset_device(rs, k=16, block_size=64)
    fk = K.frequent_kmers(kc, distinct_fraction=0.9995)
    sk = MH.build_sketches(rs, k=16, n_hashes=512, frequent=fk, block_size=64)
    pairs = MH.find_candidates(sk, min_matches=2, block_size=64)
    cand = MH.place_candidates(rs, pairs, k=16, frequent=fk, min_shared=4, chunk=64)
    ov = AL.verify_overlaps(rs, cand, band=128, max_erate=0.35, min_overlap=700, chunk=64)

    tset = {(int(a), int(b)) for a, b, _ in true_overlaps(truth, min_overlap=1200)}
    t400 = {(int(a), int(b)) for a, b, _ in true_overlaps(truth, min_overlap=400)}
    vset = {(int(a), int(b)) for a, b in zip(ov.a_id, ov.b_id)}
    recall = len(tset & vset) / max(1, len(tset))
    fp = vset - t400
    assert recall >= 0.7, f"recall {recall:.2f}"
    assert len(fp) <= 0.02 * max(1, len(vset)), f"{len(fp)}/{len(vset)} false"
    # verified erates should center near the expected pairwise rate (~0.19)
    med_er = float(np.median(ov.erate))
    assert 0.1 < med_er < 0.3, med_er


@pytest.mark.slow
def test_verify_orient_mode_matches_placed_path():
    """Raw (a,b) pairs into verify_overlaps (orientation voted in-kernel,
    place_candidates folded in) must find the same overlaps as the
    explicit place -> verify path."""
    g = random_genome(20_000, seed=15)
    rs, truth = simulate_reads(
        g, coverage=8, mean_len=2500, min_len=800, error_rate=0.10, seed=16, circular=False
    )
    kc = K.count_readset_device(rs, k=16, block_size=64)
    fk = K.frequent_kmers(kc, distinct_fraction=0.9995)
    sk = MH.build_sketches(rs, k=16, n_hashes=512, frequent=fk, block_size=64)
    pairs = MH.find_candidates(sk, min_matches=2, block_size=64)

    cand = MH.place_candidates(rs, pairs, k=16, frequent=fk, min_shared=4, chunk=64)
    ov_placed = AL.verify_overlaps(rs, cand, band=128, max_erate=0.35, min_overlap=700, chunk=64)
    ov_raw = AL.verify_overlaps(
        rs, pairs, band=128, max_erate=0.35, min_overlap=700, chunk=64, min_shared=4
    )

    placed = {(int(a), int(b)) for a, b in zip(ov_placed.a_id, ov_placed.b_id)}
    raw = {(int(a), int(b), bool(f)) for a, b, f in zip(ov_raw.a_id, ov_raw.b_id, ov_raw.flipped)}
    raw_pairs = {(a, b) for a, b, _ in raw}
    # same pair set modulo a small fringe (different anchor subsampling)
    sym = placed ^ raw_pairs
    assert len(sym) <= 0.05 * max(1, len(placed)), (len(sym), len(placed))
    # orientations must agree with the placed path wherever both kept the pair
    placed_fl = {(int(a), int(b)): bool(f) for a, b, f in zip(ov_placed.a_id, ov_placed.b_id, ov_placed.flipped)}
    for a, b, f in raw:
        if (a, b) in placed_fl:
            assert placed_fl[(a, b)] == f, (a, b)
