"""Full-pipeline tests through the CLI surface: raw reads -> contigs,
resume contract, config registry semantics."""

import os
import subprocess
import sys

import numpy as np
import pytest

from canu_tpu.config import Config, ConfigError
from canu_tpu.sim.simulate import random_genome, simulate_reads
from canu_tpu.io.fastx import read_fastx, write_fasta
from canu_tpu.utils import bitpack


def test_config_registry():
    cfg = Config()
    # tag fan-out
    cfg.set("merSize", 12)
    assert cfg.get("corMerSize") == 12 and cfg.get("utgMerSize") == 12
    # explicit specialization survives later fan-out
    cfg.set("utgMerSize", 14)
    cfg.set("merSize", 13)
    assert cfg.get("corMerSize") == 13 and cfg.get("utgMerSize") == 14
    # meta params
    cfg.set("rawErrorRate", 0.25)
    assert cfg.get("corOvlErrorRate") == 0.25
    cfg.set("correctedErrorRate", 0.08)
    assert cfg.get("obtOvlErrorRate") == 0.08 and cfg.get("utgOvlErrorRate") == 0.08
    # unknown key errors
    with pytest.raises(ConfigError):
        cfg.set("definitelyNotAKey", 1)
    # sizes
    cfg.set("genomeSize", "4.6m")
    assert cfg.get("genomeSize") == 4.6e6
    cfg.validate()
    # presets
    assert cfg.sketch_preset("utg") == (512, 2)
    assert cfg.sketch_preset("cor", coverage=10) == (768, 2)
    assert cfg.sketch_preset("cor", coverage=50) == (512, 2)
    # validation catches bad values
    cfg.set("utgBandWidth", 100)
    with pytest.raises(ConfigError):
        cfg.validate()


@pytest.fixture(scope="module")
def sim_reads(tmp_path_factory):
    d = tmp_path_factory.mktemp("simdata")
    g = random_genome(9_000, seed=60)
    rs, _ = simulate_reads(
        g, coverage=12, mean_len=1200, min_len=900, max_len=1600,
        error_rate=0.08, seed=61, circular=False,
    )
    path = d / "raw.fasta"
    write_fasta(path, ((rs.name(i), rs.get_seq(i)) for i in range(1, rs.n_reads + 1)))
    return str(path), g


def _run_cli(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATHX"] = ""
    return subprocess.run(
        [sys.executable, "-m", "canu_tpu", *args],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1200,
    )


def test_cli_options():
    r = _run_cli(["-options"], ".")
    assert r.returncode == 0
    assert "genomeSize" in r.stdout and "corOvlErrorRate" in r.stdout


def test_cli_requires_genome_size(tmp_path, sim_reads):
    raw, _ = sim_reads
    r = _run_cli(["-p", "t", "-d", str(tmp_path / "a"), "-trimmed", raw], ".")
    assert r.returncode == 2
    assert "genomeSize" in r.stderr


@pytest.mark.slow
def test_full_pipeline_raw_to_contigs(tmp_path, sim_reads):
    raw, genome = sim_reads
    wd = str(tmp_path / "asm")
    r = _run_cli(
        ["-p", "t", "-d", wd, "genomeSize=9k", "corOutCoverage=5",
         "corMaxEvidenceCoverage=12", "minReadLength=800", "minOverlapLength=400", "-pacbio-raw", raw],
        ".",
    )
    assert r.returncode == 0, r.stderr[-3000:]
    contigs = list(read_fastx(os.path.join(wd, "t.contigs.fasta")))
    assert len(contigs) >= 1
    big = max(contigs, key=lambda c: len(c.seq))
    assert len(big.seq) > 0.7 * len(genome), len(big.seq)
    # identity of the big contig vs the genome: corrected+assembled should
    # be well above raw read quality
    from tests.test_assembly_slice import identity_vs_genome

    ident = identity_vs_genome(bitpack.seq_to_codes(big.seq), genome)
    # iterative repileup polish (mergeRefine role): corrected + polished
    # contigs must be near-perfect, not merely read-quality
    assert ident >= 0.999, ident
    # bogusness-style verdict on the whole assembly: everything places,
    # nothing is chimeric, most of the genome is covered exactly once
    from canu_tpu.sim.bogus import evaluate_assembly

    ev = evaluate_assembly(
        genome, [c.seq for c in contigs], k=21, circular=False
    )
    assert ev.n_misjoins == 0, ev.summary()
    assert ev.genome_fraction > 0.8, ev.summary()
    assert ev.identity >= 0.995, ev.summary()
    assert ev.duplication < 1.5, ev.summary()
    # report exists and mentions every phase
    with open(os.path.join(wd, "t.report")) as fh:
        rep = fh.read()
    for key in ("cor.gatekeeper", "cor.meryl", "cor.overlap", "cor.correct",
                "obt.trim", "utg.unitig", "utg.output"):
        assert key in rep, key

    # resume: re-running is a fast no-op (all stages skip)
    r2 = _run_cli(
        ["-p", "t", "-d", wd, "genomeSize=9k", "corOutCoverage=5",
         "corMaxEvidenceCoverage=12", "minReadLength=800", "minOverlapLength=400", "-pacbio-raw", raw],
        ".",
    )
    assert r2.returncode == 0
    assert "skipping" in r2.stderr or "already done" in r2.stderr


def test_read_type_profiles():
    # nanopore profile sets the whole gate group (canu.pl:499-517)
    cfg = Config()
    cfg.set("readType", "nanopore")
    cfg.apply_read_type_profile()
    assert cfg.get("corOvlErrorRate") == 0.320
    assert cfg.get("utgOvlErrorRate") == 0.144
    assert cfg.get("corMhapSensitivity") == "high"
    # explicit user values survive the profile
    cfg2 = Config()
    cfg2.set("readType", "nanopore")
    cfg2.set("utgOvlErrorRate", 0.08)
    cfg2.apply_read_type_profile()
    assert cfg2.get("utgOvlErrorRate") == 0.08
    assert cfg2.get("corOvlErrorRate") == 0.320
    # pacbio profile
    cfg3 = Config()
    cfg3.apply_read_type_profile()
    assert cfg3.get("obtOvlErrorRate") == 0.045
    # meta keys (rawErrorRate/correctedErrorRate) set explicitly survive
    # the profile, as do the members they fan out to (the reference marks
    # fanned members as set, Defaults.pm setGlobalIfUndef)
    cfg4 = Config()
    cfg4.set("rawErrorRate", 0.25)
    cfg4.set("correctedErrorRate", 0.06)
    cfg4.apply_read_type_profile()
    assert cfg4.get("rawErrorRate") == 0.25
    assert cfg4.get("corOvlErrorRate") == 0.25
    assert cfg4.get("correctedErrorRate") == 0.06
    assert cfg4.get("obtOvlErrorRate") == 0.06
    assert cfg4.get("utgOvlErrorRate") == 0.06
    # tag fan-out marks members explicit too
    cfg5 = Config()
    cfg5.set("ovlErrorRate", 0.11)
    cfg5.apply_read_type_profile()
    assert cfg5.get("corOvlErrorRate") == 0.11
    assert cfg5.get("utgOvlErrorRate") == 0.11
