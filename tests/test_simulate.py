import numpy as np

from canu_tpu.sim.simulate import (
    ReadTruth,
    mutate_read,
    random_genome,
    simulate_reads,
    true_overlaps,
)
from canu_tpu.utils import bitpack


def test_random_genome_repeats():
    g = random_genome(10000, seed=3, repeat_spec=[(500, 3)])
    assert len(g) == 10000
    assert g.max() <= 3


def test_mutate_read_zero_error():
    rng = np.random.default_rng(0)
    codes = np.array([0, 1, 2, 3] * 25, dtype=np.uint8)
    out = mutate_read(codes, 0.0, rng)
    np.testing.assert_array_equal(out, codes)


def test_mutate_read_error_rate():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=200_000).astype(np.uint8)
    out = mutate_read(codes, 0.10, rng)
    # length roughly preserved (ins adds, del removes; p_ins>p_del slightly)
    assert abs(len(out) - len(codes)) < 0.05 * len(codes)
    # identity of aligned prefix should be well below perfect; crude check:
    # hamming over min length should show differences
    m = min(len(out), len(codes))
    diff = (out[:m] != codes[:m]).mean()
    assert diff > 0.01


def test_simulate_reads_truth_positions():
    g = random_genome(50_000, seed=5)
    rs, truth = simulate_reads(g, coverage=5, mean_len=4000, error_rate=0.0, seed=7, circular=False)
    assert rs.n_reads == len(truth.start)
    # with zero error, the stored read equals the genome slice (rc if strand)
    g2 = g
    for rid in range(1, min(rs.n_reads, 10) + 1):
        i = rid - 1
        tmpl = g2[truth.start[i] : truth.end[i]]
        if truth.strand[i]:
            tmpl = bitpack.revcomp_codes(tmpl)
        np.testing.assert_array_equal(rs.get_codes(rid), tmpl)


def test_simulate_coverage():
    g = random_genome(100_000, seed=1)
    rs, _ = simulate_reads(g, coverage=10, mean_len=5000, error_rate=0.1, seed=2)
    assert rs.total_bases >= 10 * len(g)
    assert rs.total_bases < 12 * len(g)


def test_true_overlaps_simple():
    # two reads overlapping by 300 on a linear genome
    truth = ReadTruth(
        genome_len=10_000,
        circular=False,
        start=np.array([0, 700, 5000]),
        end=np.array([1000, 1700, 6000]),
        strand=np.array([0, 1, 0], dtype=np.uint8),
    )
    ov = true_overlaps(truth, min_overlap=200)
    assert ov.shape == (1, 3)
    assert tuple(ov[0]) == (1, 2, 300)


def test_true_overlaps_circular_wrap():
    truth = ReadTruth(
        genome_len=10_000,
        circular=True,
        start=np.array([9500, 100]),
        end=np.array([10_600, 900]),  # read 1 wraps to 600
        strand=np.array([0, 0], dtype=np.uint8),
    )
    ov = true_overlaps(truth, min_overlap=200)
    assert ov.shape == (1, 3)
    assert ov[0, 0] == 1 and ov[0, 1] == 2 and ov[0, 2] == 500
