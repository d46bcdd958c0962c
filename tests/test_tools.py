"""Tools CLI tests (the reference's ancillary-binary surface)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_tool(args, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "canu_tpu.tools", *args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )


@pytest.fixture(scope="module")
def sim_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("tooldata")
    reads = str(d / "reads.fasta")
    genome = str(d / "genome.fasta")
    truth = str(d / "truth.tsv")
    r = run_tool([
        "simulate", "-genomesize", "20000", "-coverage", "8",
        "-meanlen", "2000", "-minlen", "1000", "-error", "0.05",
        "-o", reads, "-genome-out", genome, "-truth-out", truth,
    ])
    assert r.returncode == 0, r.stderr
    return d, reads, genome, truth


def test_simulate_analyze_sample(sim_files):
    d, reads, genome, truth = sim_files
    assert os.path.exists(truth) and len(open(truth).readlines()) > 10

    r = run_tool(["analyze", reads])
    assert r.returncode == 0, r.stderr
    st = json.loads(r.stdout)
    assert st["reads"] > 10 and st["bases"] > 100_000
    assert 0.3 < st["gc"] < 0.7

    out = str(d / "sampled.fasta")
    r = run_tool(["sample", reads, "-o", out,
                  "-coverage", "3", "-genomesize", "20000"])
    assert r.returncode == 0, r.stderr
    r2 = run_tool(["analyze", out])
    st2 = json.loads(r2.stdout)
    assert 60_000 <= st2["bases"] <= 75_000  # ~3x of 20k, one-read overshoot


def test_store_dump_roundtrip(sim_files, tmp_path):
    d, reads, genome, truth = sim_files
    # build a read store by loading via the library, then dump tools on it
    sys.path.insert(0, REPO)
    from canu_tpu.stores.readset import ReadSet

    rs, _ = ReadSet.from_fastx([reads])
    store = str(tmp_path / "reads.gkpStore")
    rs.save(store)

    r = run_tool(["dump-meta", store])
    meta = json.loads(r.stdout)
    assert meta["reads"] == rs.n_reads and meta["bases"] == rs.total_bases

    out = str(tmp_path / "dump.fasta")
    r = run_tool(["dump-reads", store, "-o", out, "-b", "1", "-e", "5"])
    assert r.returncode == 0, r.stderr
    from canu_tpu.io.fastx import read_fastx

    recs = list(read_fastx(out))
    assert len(recs) == 5
    assert recs[0].seq == rs.get_seq(1)


@pytest.mark.slow
def test_ov_import_stats_dump(tmp_path):
    store = str(tmp_path / "ovl")
    r = run_tool(["ov-import", "-random", "500", "-nreads", "100", "-o", store])
    assert r.returncode == 0, r.stderr

    r = run_tool(["ov-stats", store])
    st = json.loads(r.stdout)
    assert st["overlaps"] == 500

    out = str(tmp_path / "ovl.txt")
    r = run_tool(["ov-dump", store, "-o", out])
    assert r.returncode == 0, r.stderr
    assert "dumped 500" in r.stdout

    # text -> store roundtrip
    store2 = str(tmp_path / "ovl2")
    r = run_tool(["ov-import", "-i", out, "-nreads", "100", "-o", store2])
    assert r.returncode == 0, r.stderr
    r = run_tool(["ov-stats", store2])
    assert json.loads(r.stdout)["overlaps"] == 500


def test_kmer_count_tool(sim_files):
    d, reads, genome, truth = sim_files
    r = run_tool(["kmer-count", reads, "-k", "14", "-threshold-fraction", "0.99"])
    assert r.returncode == 0, r.stderr
    st = json.loads(r.stdout)
    assert st["distinct"] > 10_000
    assert st["total"] >= st["distinct"]
    assert "frequent_threshold" in st


@pytest.mark.slow
def test_bogus_tool(sim_files, tmp_path):
    d, reads, genome, truth = sim_files
    # assembly == the genome itself: perfect verdict
    r = run_tool(["bogus", "-genome", genome, "-assembly", genome, "-verbose"])
    assert r.returncode == 0, r.stderr + r.stdout
    assert "misjoins 0" in r.stdout
    assert "identity 1.0000" in r.stdout


def test_tig_dump_and_display(tmp_path):
    sys.path.insert(0, REPO)
    import numpy as np

    from canu_tpu.stores.tigs import Tig, TigStore
    from canu_tpu.utils.bitpack import seq_to_codes

    ts = TigStore()
    ts.add(Tig(
        tig_id=1,
        read_id=np.array([3, 7], np.int32),
        bgn=np.array([0, 500], np.int32),
        end=np.array([900, 1400], np.int32),
        rev=np.array([False, True]),
        consensus=seq_to_codes("ACGT" * 350),
    ))
    store = str(tmp_path / "ctg")
    ts.save(store, version=2)

    r = run_tool(["tig-dump", store, "sizes"])
    st = json.loads(r.stdout)
    assert st["contigs"] == 1 and st["n50"] == 1400

    out = str(tmp_path / "tigs.fasta")
    r = run_tool(["tig-dump", store, "fasta", "-o", out])
    assert r.returncode == 0, r.stderr
    from canu_tpu.io.fastx import read_fastx

    assert len(next(iter(read_fastx(out))).seq) == 1400

    r = run_tool(["tig-display", store, "1"])
    assert r.returncode == 0, r.stderr
    assert "read        3" in r.stdout and "<--" in r.stdout


@pytest.mark.slow
def test_kmer_db_and_ops(sim_files, tmp_path):
    d, reads, genome, truth = sim_files
    db1 = str(tmp_path / "a.npz")
    db2 = str(tmp_path / "b.npz")
    r = run_tool(["kmer-count", reads, "-k", "14", "-o", db1])
    assert r.returncode == 0, r.stderr
    n1 = json.loads(r.stdout)["distinct"]
    r = run_tool(["kmer-count", genome, "-k", "14", "-o", db2])
    assert r.returncode == 0, r.stderr
    # intersect: genomic k-mers present in the reads
    out = str(tmp_path / "i.npz")
    r = run_tool(["kmer-op", "intersect-min", db1, db2, "-o", out])
    assert r.returncode == 0, r.stderr
    st = json.loads(r.stdout)
    assert 0 < st["distinct"] <= n1
    # count filter on the result
    out2 = str(tmp_path / "f.npz")
    r = run_tool(["kmer-op", "at-least", out, "-n", "2", "-o", out2])
    assert r.returncode == 0, r.stderr
    assert json.loads(r.stdout)["distinct"] <= st["distinct"]
