import numpy as np
import jax.numpy as jnp
import pytest

from canu_tpu.ops import kmer as K
from canu_tpu.stores.readset import ReadSet
from canu_tpu.utils import bitpack
from canu_tpu.sim.simulate import random_genome, simulate_reads


def brute_canonical_kmers(seq: str, k: int) -> list[int]:
    """Reference k-mer extraction in plain Python."""
    code = {"A": 0, "C": 1, "G": 2, "T": 3}
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    out = []
    for i in range(len(seq) - k + 1):
        sub = seq[i : i + k]
        fw = 0
        for ch in sub:
            fw = fw * 4 + code[ch]
        rcseq = "".join(comp[c] for c in reversed(sub))
        rc = 0
        for ch in rcseq:
            rc = rc * 4 + code[ch]
        out.append(min(fw, rc))
    return out


@pytest.mark.parametrize("k", [3, 8, 16])
def test_extract_kmers_matches_bruteforce(k):
    rng = np.random.default_rng(42)
    seqs = [bitpack.codes_to_seq(rng.integers(0, 4, size=n).astype(np.uint8)) for n in [40, 33, 17]]
    rs = ReadSet.from_sequences(seqs)
    words, lens = rs.block_words(np.array([1, 2, 3]))
    canon, strand = K.extract_kmers(jnp.asarray(words), jnp.asarray(lens), k)
    canon = np.asarray(canon)
    for row, seq in enumerate(seqs):
        expect = brute_canonical_kmers(seq, k)
        got = canon[row][: len(expect)]
        np.testing.assert_array_equal(got, np.array(expect, dtype=np.uint32))
        # everything past the read end is INVALID
        assert (canon[row][len(expect) :] == 0xFFFFFFFF).all()


def test_strand_flag():
    # AAAA -> canonical is AAAA (fw), TTTT -> canonical is AAAA via rc
    rs = ReadSet.from_sequences(["AAAAC", "GTTTT"])
    words, lens = rs.block_words(np.array([1, 2]))
    canon, strand = K.extract_kmers(jnp.asarray(words), jnp.asarray(lens), 4)
    canon, strand = np.asarray(canon), np.asarray(strand)
    assert canon[0][0] == 0  # AAAA
    assert not strand[0][0]
    assert canon[1][1] == 0  # TTTT == rc(AAAA)
    assert strand[1][1]


def test_sort_count():
    arr = jnp.asarray(np.array([5, 3, 5, 5, 3, 9], dtype=np.uint32))
    s, c = K.sort_count(arr)
    s, c = np.asarray(s), np.asarray(c)
    np.testing.assert_array_equal(s, [3, 3, 5, 5, 5, 9])
    np.testing.assert_array_equal(c, [2, 0, 3, 0, 0, 1])


def test_count_reads_matches_bruteforce():
    g = random_genome(3000, seed=0)
    rs, _ = simulate_reads(g, coverage=3, mean_len=600, min_len=100, error_rate=0.05, seed=1)
    k = 11
    kc = K.count_reads(rs, k=k, block_size=7)
    # brute force
    from collections import Counter

    cnt = Counter()
    for rid in range(1, rs.n_reads + 1):
        cnt.update(brute_canonical_kmers(rs.get_seq(rid), k))
    assert kc.n_distinct == len(cnt)
    expect = np.array(sorted(cnt.keys()), dtype=np.uint32)
    np.testing.assert_array_equal(kc.unique, expect)
    np.testing.assert_array_equal(kc.counts, [cnt[int(u)] for u in expect])


def test_histogram_and_thresholds():
    # build synthetic counts: many singletons, some mid, few huge
    u = np.arange(1000, dtype=np.uint32)
    c = np.ones(1000, dtype=np.int64)
    c[:50] = 20  # coverage-ish
    c[:5] = 500  # repeats
    kc = K.KmerCounts(16, u, c)
    h = kc.histogram()
    assert h[1] == 950 and h[20] == 45 and h[500] == 5
    thr = K.threshold_from_distinct_fraction(kc, 0.995)
    assert thr == 20  # keeps singletons+mids, cuts the 5 repeats
    fk = K.frequent_kmers(kc, threshold=thr)
    assert fk.n == 5
    assert np.all(fk.fraction > 0)


def test_merge_counts():
    a = K.KmerCounts(16, np.array([1, 3, 5], np.uint32), np.array([2, 1, 4], np.int64))
    b = K.KmerCounts(16, np.array([3, 4], np.uint32), np.array([10, 1], np.int64))
    m = a.merge(b)
    np.testing.assert_array_equal(m.unique, [1, 3, 4, 5])
    np.testing.assert_array_equal(m.counts, [2, 11, 1, 4])


def test_db_save_load_roundtrip(tmp_path):
    a = K.KmerCounts(16, np.array([1, 3, 5], np.uint32), np.array([2, 1, 4], np.int64))
    p = str(tmp_path / "db")
    a.save(p)
    b = K.KmerCounts.load(p)
    assert b.k == 16
    np.testing.assert_array_equal(b.unique, a.unique)
    np.testing.assert_array_equal(b.counts, a.counts)
