import pytest
import numpy as np
import jax.numpy as jnp

from canu_tpu.ops.trace import align_positions
from canu_tpu.ops import falcon as F
from canu_tpu.sim.simulate import mutate_read, random_genome, simulate_reads
from canu_tpu.utils import bitpack


def brute_global(a, b):
    la, lb = len(a), len(b)
    D = np.zeros((la + 1, lb + 1), np.int64)
    D[:, 0] = np.arange(la + 1)
    D[0, :] = np.arange(lb + 1)
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            D[i, j] = min(D[i - 1, j] + 1, D[i, j - 1] + 1, D[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    return int(D[la, lb])


def run_positions(t, e, band=128):
    n_rows = max(len(t), 8)
    L = max(len(t), len(e)) + band
    ta = np.zeros((1, L), np.uint8); ta[0, : len(t)] = t
    ea = np.zeros((1, L), np.uint8); ea[0, : len(e)] = e
    cen = np.zeros((1, n_rows + 1), np.int32)
    cen[0, : len(t) + 1] = np.round(np.linspace(0, len(e), len(t) + 1)).astype(np.int32)
    cen[0, len(t) + 1 :] = len(e)
    js, ed = align_positions(
        jnp.asarray(ta), jnp.asarray(np.array([len(t)], np.int32)),
        jnp.asarray(ea), jnp.asarray(np.array([len(e)], np.int32)),
        jnp.asarray(cen), band, n_rows,
    )
    return np.asarray(js)[0, : len(t) + 1], int(ed[0])


def test_positions_exact():
    rng = np.random.default_rng(0)
    t = rng.integers(0, 4, 200).astype(np.uint8)
    js, ed = run_positions(t, t)
    assert ed == 0
    np.testing.assert_array_equal(js, np.arange(201))


def test_positions_edits_match_bruteforce():
    rng = np.random.default_rng(1)
    for trial in range(4):
        t = rng.integers(0, 4, int(rng.integers(80, 200))).astype(np.uint8)
        e = mutate_read(t, 0.15, rng)
        js, ed = run_positions(t, e, band=128)
        assert ed == brute_global(t, e), trial
        # monotone, pinned ends
        assert js[0] == 0 and js[-1] == len(e)
        assert (np.diff(js) >= 0).all()


@pytest.mark.slow
def test_positions_lean_matches_bruteforce():
    """align_positions_lean: exact edits + pinned monotone positions."""
    from canu_tpu.ops.trace import align_positions_lean

    rng = np.random.default_rng(3)
    for trial in range(4):
        t = rng.integers(0, 4, int(rng.integers(80, 200))).astype(np.uint8)
        e = mutate_read(t, 0.15, rng)
        n_rows = 256
        ta = np.zeros((2, n_rows), np.uint8); ta[0, : len(t)] = t
        ea = np.zeros((2, n_rows + 128), np.uint8); ea[0, : len(e)] = e
        # row 1 is a zero-length pad row (the engine's padding contract)
        js, ed = align_positions_lean(
            jnp.asarray(ta), jnp.asarray(np.array([len(t), 0], np.int32)),
            jnp.asarray(ea), jnp.asarray(np.array([len(e), 0], np.int32)),
            128, n_rows,
        )
        js = np.asarray(js)
        assert int(ed[0]) == brute_global(t, e), trial
        # trailing-insertion cost ties can leave the endpoint a base or
        # two short of e_len (no vote impact); require near-pinning
        assert js[0, 0] == 0 and js[0, len(t)] >= len(e) - 2
        assert (np.diff(js[0, : len(t) + 1]) >= 0).all()
        assert (js[1] == 0).all()


@pytest.mark.slow
def test_correct_reads_end_to_end():
    """Raw 10%-error reads -> corrected reads at >=99% identity."""
    from canu_tpu.ops import kmer as K, minhash as MH, align as AL
    from canu_tpu.stores.overlaps import OverlapStore

    g = random_genome(12_000, seed=50)
    rs, truth = simulate_reads(
        g, coverage=12, mean_len=1500, min_len=1000, max_len=2000,
        error_rate=0.10, seed=51, circular=False,
    )
    kc = K.count_readset_device(rs, k=16, block_size=64)
    fk = K.frequent_kmers(kc, distinct_fraction=0.9995)
    sk = MH.build_sketches(rs, k=16, n_hashes=512, frequent=fk, block_size=64)
    pairs = MH.find_candidates(sk, min_matches=2, block_size=64)
    cand = MH.place_candidates(rs, pairs, k=16, frequent=fk, min_shared=4, chunk=64)
    ov = AL.verify_overlaps(rs, cand, band=256, max_erate=0.35, min_overlap=500, chunk=64)
    st = OverlapStore.build(ov, rs.n_reads)

    corrected = list(
        F.correct_reads(
            rs, st, genome_size=12_000, out_coverage=4, max_evidence_coverage=10,
            band=256, min_piece=800,
        )
    )
    assert len(corrected) >= 3, len(corrected)
    # validate each corrected read against the genome with exact 24-mer
    # anchoring + our DP
    from tests.test_align import brute_extend

    idents = []
    gstr = bitpack.codes_to_seq(g)
    grc = bitpack.codes_to_seq(bitpack.revcomp_codes(g))
    for name, seq in corrected[:6]:
        best = 0.0
        for target in (gstr, grc):
            for probe_at in range(0, min(400, len(seq) - 24), 40):
                off = target.find(seq[probe_at : probe_at + 24])
                if off < 0:
                    continue
                a = bitpack.seq_to_codes(seq[probe_at:])
                b = bitpack.seq_to_codes(target[off : off + len(seq)])
                e, au, bu = brute_extend(a[:800], b[:900])
                best = max(best, 1 - e / max(1, au))
                break
            if best > 0.99:
                break
        idents.append(best)
    idents = np.array(idents)
    assert (idents > 0).all(), idents  # every corrected read maps somewhere
    assert np.median(idents) >= 0.985, idents
