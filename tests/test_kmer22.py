"""k > 16 support: exact 2-lane counting + hashed matching path.

The reference's ovl/utg stages default to k=22
(/root/reference/src/pipelines/canu/Defaults.pm ovlMerSize); round 1
capped k at 16.  These tests pin the 2-lane packing (exact counts vs a
pure-python brute force) and that the whole overlap path (sketches ->
candidates -> syncmer anchors -> banded verify) runs and recalls true
overlaps at k=22.
"""

import numpy as np
import pytest

from canu_tpu.sim.simulate import random_genome, simulate_reads, true_overlaps
from canu_tpu.stores.readset import ReadSet
from canu_tpu.utils import bitpack


def brute_count(seqs, k):
    from collections import Counter

    comp = str.maketrans("ACGT", "TGCA")
    c = Counter()
    for s in seqs:
        for i in range(len(s) - k + 1):
            m = s[i : i + k]
            rc = m.translate(comp)[::-1]
            c[min(m, rc)] += 1
    return c


def kmer_to_str(v, k):
    return "".join("ACGT"[(int(v) >> (2 * (k - 1 - i))) & 3] for i in range(k))


@pytest.mark.slow
@pytest.mark.parametrize("k", [17, 22, 31])
def test_two_lane_count_exact(k):
    from canu_tpu.ops import kmer as K

    rng = np.random.default_rng(90 + k)
    seqs = ["".join(rng.choice(list("ACGT"), 300)) for _ in range(8)]
    rs = ReadSet.from_sequences(seqs)
    kc = K.count_readset_device(rs, k=k, block_size=8).to_host()
    assert kc.unique.dtype == np.uint64
    ref = brute_count(seqs, k)
    got = {kmer_to_str(v, k): int(c) for v, c in zip(kc.unique, kc.counts)}
    assert got == dict(ref)


@pytest.mark.slow
def test_k22_overlap_path_recall():
    """Full candidate+verify path at k=22 recalls simulated overlaps.

    3%-error reads: the corrected-read regime where the reference uses
    k=22 (utg/obt stages run on falcon-corrected reads)."""
    from canu_tpu.ops import align as AL, kmer as K, minhash as MH

    k = 22
    g = random_genome(15_000, seed=95)
    rs, truth = simulate_reads(
        g, coverage=8, mean_len=1500, min_len=900, error_rate=0.03, seed=96,
        circular=False,
    )
    kc = K.count_readset_device(rs, k=k, block_size=64)
    fk = K.frequent_kmers(kc, distinct_fraction=0.9995)
    assert fk.kmers_exact is None or len(fk.kmers_exact) == fk.n
    sk = MH.build_sketches(rs, k=k, n_hashes=512, frequent=fk, block_size=64)
    pairs = MH.find_candidates(sk, min_matches=2, block_size=64)
    assert len(pairs) > 0
    ov = AL.verify_overlaps(
        rs, pairs, k=k, band=128, max_erate=0.32, min_overlap=500, chunk=64,
        min_shared=3,
    )
    found = {
        (int(a), int(b)) for a, b in zip(ov.a_id, ov.b_id)
    }
    tr = true_overlaps(truth, min_overlap=700)
    want = {(int(a), int(b)) for a, b, _ in tr}
    assert want, "simulation must produce true overlaps"
    recall = len(found & want) / len(want)
    assert recall >= 0.85, (recall, len(want), len(found))
