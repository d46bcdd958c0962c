"""QV plane, quality clear ranges, and QV-weighted voting."""

import os

import numpy as np
import pytest

from canu_tpu.io.fastx import write_fastq
from canu_tpu.stores.readset import ReadSet
from canu_tpu.utils.quality import quality_clear_ranges, read_quality_histogram


def _write_reads(path, recs):
    write_fastq(path, recs)


def test_fastq_qual_roundtrip(tmp_path):
    seqs = ["ACGT" * 300, "TTGCA" * 250]
    quals = [
        "".join(chr(33 + (i % 40)) for i in range(len(s))) for s in seqs
    ]
    fq = os.path.join(tmp_path, "r.fastq")
    _write_reads(fq, [("r1", seqs[0], quals[0]), ("r2", seqs[1], quals[1])])
    rs, stats = ReadSet.from_fastx(fq, min_read_length=100)
    assert rs.has_quals
    assert stats.n_loaded == 2
    for i, q in enumerate(quals):
        expect = np.frombuffer(q.encode(), np.uint8) - 33
        np.testing.assert_array_equal(rs.get_qual(i + 1), expect)
    # save/load preserves the plane
    store = os.path.join(tmp_path, "gkp")
    rs.save(store)
    rs2 = ReadSet.load(store)
    assert rs2.has_quals
    np.testing.assert_array_equal(rs2.get_qual(2), rs.get_qual(2))
    mq = rs2.mean_quals()
    assert mq is not None and len(mq) == 2
    assert read_quality_histogram(mq).sum() == 2


def test_fasta_has_no_quals(tmp_path):
    fa = os.path.join(tmp_path, "r.fasta")
    with open(fa, "w") as fh:
        fh.write(">a\n" + "ACGT" * 300 + "\n")
    rs, _ = ReadSet.from_fastx(fa, min_read_length=100)
    assert not rs.has_quals
    assert rs.get_qual(1) is None
    assert rs.mean_quals() is None


def test_quality_clear_trims_bad_tail():
    n = 2000
    good = np.full(n, 20, np.uint8)
    # read 1: uniformly good; read 2: last 400 bases terrible
    q2 = good.copy()
    q2[-400:] = 2
    length = np.array([n, n], np.int32)
    quals = np.concatenate([good, q2])
    off = np.array([0, n, 2 * n], np.int64)
    b, e = quality_clear_ranges(length, quals, off, min_qv=7.0, window=100)
    assert b[0] == 0 and e[0] == n
    assert b[1] == 0
    # clear range ends inside/near the bad tail, never spans it
    assert n - 450 <= e[1] <= n - 300
    # the SAME read with good QVs everywhere keeps its full span:
    # QVs changed the clear range
    assert e[1] < e[0]


def test_quality_clear_unknown_qv_neutral():
    # QV 0 = unknown keeps the full read
    length = np.array([1500], np.int32)
    quals = np.zeros(1500, np.uint8)
    off = np.array([0, 1500], np.int64)
    b, e = quality_clear_ranges(length, quals, off, min_qv=7.0, window=100)
    assert b[0] == 0 and e[0] == 1500


def test_quality_clear_hopeless_read():
    length = np.array([1200], np.int32)
    quals = np.full(1200, 1, np.uint8)
    off = np.array([0, 1200], np.int64)
    b, e = quality_clear_ranges(length, quals, off, min_qv=7.0, window=100)
    assert e[0] - b[0] == 0


def test_sliced_carries_quals_and_provenance():
    seqs = ["ACGTACGTAC" * 100, "TTTTGGGGCC" * 100]
    quals_list = [
        np.arange(1000, dtype=np.uint8) % 50,
        (np.arange(1000, dtype=np.uint8) % 50)[::-1].copy(),
    ]
    from canu_tpu.utils import bitpack

    rs = ReadSet.from_codes_list(
        [bitpack.seq_to_codes(s) for s in seqs],
        names=["a", "b"],
        quals_list=quals_list,
    )
    b = np.array([100, 0])
    e = np.array([900, 1000])
    sub = rs.sliced(b, e)
    assert sub.n_reads == 2
    assert sub.get_seq(1) == seqs[0][100:900]
    np.testing.assert_array_equal(sub.get_qual(1), quals_list[0][100:900])
    assert sub.source_id[0] == 1 and sub.source_bgn[0] == 100
    # empty range drops the read
    sub2 = rs.sliced(np.array([0, 0]), np.array([0, 1000]))
    assert sub2.n_reads == 1 and sub2.names[0] == "b"


@pytest.mark.slow
def test_qv_weight_breaks_vote_tie():
    """Two evidence reads disagree at one position; the higher-QV read wins."""
    import jax.numpy as jnp

    from canu_tpu.ops.votepile import (
        VoteJobs,
        _finalize_plurality,
        device_words,
        pile_votes,
    )
    from canu_tpu.utils import bitpack

    rng = np.random.default_rng(3)
    tmpl = "".join("ACGT"[c] for c in rng.integers(0, 4, 600))
    # evidence A matches template; evidence B has a C->T mismatch at 300
    evA = tmpl
    evB = tmpl[:300] + ("T" if tmpl[300] != "T" else "G") + tmpl[301:]
    rs = ReadSet.from_sequences([tmpl, evA, evB])
    words_d, len_d = device_words(rs)

    def run(weights):
        jobs = VoteJobs(
            t_idx=np.array([0, 0], np.int32),
            e_idx=np.array([1, 2], np.int32),
            t_bgn=np.zeros(2, np.int32),
            t_span=np.full(2, 600, np.int32),
            e_lo=np.zeros(2, np.int32),
            e_span=np.full(2, 600, np.int32),
            flipped=np.zeros(2, bool),
            slot=np.zeros(2, np.int32),
            weight=weights,
        )
        votes = pile_votes(words_d, len_d, words_d, len_d, jobs, 8, 1024,
                           band=128)
        packed, _ = _finalize_plurality(
            words_d, len_d, jnp.asarray(np.array([0] + [3] * 7, np.int32)),
            votes, 1.0, 1024, False,
        )
        return np.asarray(packed)[0, :600]

    # B much heavier than A + template self-vote: mismatch base wins
    row = run(np.array([1.0, 3.0], np.float32))
    called = bitpack.codes_to_seq((row[:600] & 3).astype(np.uint8))
    assert called[300] == evB[300]
    # equal weights: template self-vote + A outvote B
    row = run(np.array([1.0, 1.0], np.float32))
    called = bitpack.codes_to_seq((row[:600] & 3).astype(np.uint8))
    assert called[300] == tmpl[300]
