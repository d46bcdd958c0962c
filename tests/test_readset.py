import numpy as np
import pytest

from canu_tpu.utils import bitpack
from canu_tpu.stores.readset import ReadSet
from canu_tpu.io.fastx import read_fastx, write_fasta, write_fastq


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    for n in [0, 1, 15, 16, 17, 100, 1000]:
        codes = rng.integers(0, 4, size=n).astype(np.uint8)
        words = bitpack.pack_codes(codes)
        assert len(words) == bitpack.n_words(n)
        back = bitpack.unpack_words(words, n)
        np.testing.assert_array_equal(back, codes)


def test_seq_codes_roundtrip():
    seq = "ACGTTGCAacgt"
    codes = bitpack.seq_to_codes(seq)
    assert bitpack.codes_to_seq(codes) == seq.upper()


def test_revcomp():
    codes = bitpack.seq_to_codes("AACGT")
    assert bitpack.codes_to_seq(bitpack.revcomp_codes(codes)) == "ACGTT"


def test_readset_basic():
    seqs = ["ACGT" * 10, "TTTT" * 100, "A" * 17]
    rs = ReadSet.from_sequences(seqs, names=["a", "b", "c"])
    assert rs.n_reads == 3
    assert rs.total_bases == sum(map(len, seqs))
    for i, s in enumerate(seqs):
        assert rs.get_seq(i + 1) == s
    assert rs.name(2) == "b"
    with pytest.raises(IndexError):
        rs.get_seq(0)
    with pytest.raises(IndexError):
        rs.get_seq(4)


def test_readset_block_gather():
    rng = np.random.default_rng(1)
    seqs = [bitpack.codes_to_seq(rng.integers(0, 4, size=n).astype(np.uint8)) for n in [33, 64, 7, 128]]
    rs = ReadSet.from_sequences(seqs)
    ids = np.array([4, 2, 1])
    words, lens = rs.block_words(ids)
    assert words.shape == (3, 8)  # 128 bases = 8 words
    np.testing.assert_array_equal(lens, [128, 64, 33])
    for row, rid in enumerate(ids):
        back = bitpack.unpack_words(words[row], int(lens[row]))
        np.testing.assert_array_equal(back, rs.get_codes(int(rid)))
    # padding words are zero
    assert words[2, 3:].sum() == 0


def test_readset_save_load(tmp_path):
    seqs = ["ACGTACGTACGT", "GGGGCCCCAAAATTTT"]
    rs = ReadSet.from_sequences(seqs, names=["x", "y"])
    rs.save(tmp_path / "store")
    rs2 = ReadSet.load(tmp_path / "store")
    assert rs2.n_reads == 2
    assert rs2.get_seq(1) == seqs[0]
    assert rs2.get_seq(2) == seqs[1]
    assert rs2.names == ["x", "y"]


def test_fastx_roundtrip(tmp_path):
    recs = [("r1", "ACGTACGT"), ("r2", "TTTTGGGG" * 30)]
    p = tmp_path / "t.fasta"
    write_fasta(p, recs, width=50)
    back = list(read_fastx(p))
    assert [(r.name, r.seq) for r in back] == recs

    q = tmp_path / "t.fastq.gz"
    write_fastq(q, [(n, s, "I" * len(s)) for n, s in recs])
    back = list(read_fastx(q))
    assert [(r.name, r.seq) for r in back] == recs
    assert back[0].qual == "I" * 8


def test_from_fastx_split_and_filter(tmp_path):
    p = tmp_path / "in.fasta"
    long1 = "ACGT" * 500  # 2000 bases
    long2 = "GGCA" * 300  # 1200 bases
    with_n = long1 + "NNN" + long2
    write_fasta(p, [("a", with_n), ("short", "ACGT" * 10)])
    rs, stats = ReadSet.from_fastx(p, min_read_length=1000)
    assert stats.n_input == 2
    assert stats.n_split_at_n == 1
    assert stats.n_skipped_short == 1  # the 40bp read
    assert rs.n_reads == 2
    assert rs.get_seq(1) == long1
    assert rs.get_seq(2) == long2
