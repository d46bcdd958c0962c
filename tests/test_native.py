"""Native C++ scanner vs pure-Python parser equivalence."""

import numpy as np
import pytest

from canu_tpu import native
from canu_tpu.io.fastx import write_fasta, write_fastq
from canu_tpu.stores.readset import ReadSet
from canu_tpu.sim.simulate import random_genome, simulate_reads


@pytest.fixture(scope="module")
def built():
    ok = native.build_native()
    if not ok:
        pytest.skip("no C++ toolchain available")
    assert native.get_lib() is not None
    return True


def _sim_files(tmp_path, gz: bool):
    g = random_genome(5000, seed=70)
    rs, _ = simulate_reads(g, coverage=3, mean_len=800, min_len=300, error_rate=0.02, seed=71)
    suffix = ".gz" if gz else ""
    fa = tmp_path / f"r.fasta{suffix}"
    fq = tmp_path / f"r.fastq{suffix}"
    write_fasta(fa, ((rs.name(i), rs.get_seq(i)) for i in range(1, rs.n_reads + 1)), width=60)
    write_fastq(fq, ((rs.name(i), rs.get_seq(i), "I" * int(rs.length[i - 1])) for i in range(1, rs.n_reads + 1)))
    return fa, fq


@pytest.mark.parametrize("gz", [False, True])
def test_native_matches_python(built, tmp_path, gz):
    fa, fq = _sim_files(tmp_path, gz)
    for path in (fa, fq):
        rs_native, st_n = ReadSet.from_fastx(path, min_read_length=300, use_native=True)
        rs_py, st_p = ReadSet.from_fastx(path, min_read_length=300, use_native=False)
        assert st_n == st_p
        assert rs_native.n_reads == rs_py.n_reads
        np.testing.assert_array_equal(rs_native.length, rs_py.length)
        np.testing.assert_array_equal(rs_native.words, rs_py.words)
        assert rs_native.names == rs_py.names


def test_native_n_splitting(built, tmp_path):
    p = tmp_path / "n.fasta"
    a = "ACGT" * 200
    b = "GGCC" * 150
    write_fasta(p, [("x", a + "NNNN" + b)])
    rs, stats = ReadSet.from_fastx(p, min_read_length=100, use_native=True)
    assert stats.n_split_at_n == 1
    assert rs.n_reads == 2
    assert rs.get_seq(1) == a and rs.get_seq(2) == b


def test_native_malformed(built, tmp_path):
    p = tmp_path / "bad.fastq"
    p.write_text("@r1\nACGT\nIIII\n")  # missing '+' line
    with pytest.raises(ValueError):
        ReadSet.from_fastx(p, min_read_length=1, use_native=True)
