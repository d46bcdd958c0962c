"""Round-4 parameter surface: every new key drives a real mechanism."""

import os
import subprocess
import sys

import numpy as np
import pytest

from canu_tpu.sim.simulate import random_genome, simulate_reads
from canu_tpu.stores.overlaps import OverlapStore
from canu_tpu.stores.tigs import CLASS_CONTIG


@pytest.fixture(scope="module")
def small_overlaps():
    from tests.test_assembly_slice import compute_overlaps

    g = random_genome(30_000, seed=70)
    rs, _ = simulate_reads(
        g, coverage=10, mean_len=2500, min_len=1500, max_len=4000,
        error_rate=0.03, seed=71, circular=False,
    )
    ov = compute_overlaps(rs, max_erate=0.2)
    st = OverlapStore.build(ov, rs.n_reads)
    return g, rs, st


@pytest.mark.slow
def test_cor_consensus_dag_matches_falcon(small_overlaps):
    """corConsensus=dag: the tag-chain correction produces reads the
    plurality path agrees with (>= 99% identity on shared prefixes)."""
    _g, rs, st = small_overlaps
    from canu_tpu.ops.falcon import correct_reads

    out = {}
    for mode in ("falcon", "dag"):
        items = dict(correct_reads(
            rs, st, 30_000, out_coverage=3, min_piece=500, mode=mode,
        ))
        assert len(items) >= 3, (mode, len(items))
        out[mode] = items
    both = set(out["falcon"]) & set(out["dag"])
    assert len(both) >= max(2, len(out["falcon"]) // 2)
    from tests.test_reference_diff import _banded_edist
    from canu_tpu.utils import bitpack as BP

    for name in both:
        a = BP.seq_to_codes(out["falcon"][name])
        b = BP.seq_to_codes(out["dag"][name])
        L = min(len(a), len(b))
        d = _banded_edist(a[:L], b[:L], band=64)
        assert d <= max(8, L // 100), (name, d, L)


def test_cor_max_evidence_erate_filters(small_overlaps):
    _g, rs, st = small_overlaps
    from canu_tpu.ops.falcon import select_evidence_rows, select_templates

    tids = select_templates(rs, 30_000, 4)
    all_rows = select_evidence_rows(st, tids, rs.length, 40, 0)
    tight = select_evidence_rows(st, tids, rs.length, 40, 0,
                                 max_evidence_erate=0.02)
    assert set(tight.tolist()) <= set(all_rows.tolist())
    assert len(tight) < len(all_rows)
    assert (st.erate_q[tight] <= 200).all()


def test_bat_memory_overlap_cap(small_overlaps):
    """batMemory cap: the graph still assembles one contig from the
    best-per-read overlap subset (OverlapCache computeOverlapLimit
    role)."""
    _g, rs, st = small_overlaps
    from canu_tpu.graph import build_unitigs

    full = build_unitigs(st, rs.length, max_erate=0.2)
    capped = build_unitigs(st, rs.length, max_erate=0.2,
                           max_rows=max(200, 20 * rs.n_reads))
    n_full = sum(1 for t in full if t.tig_class == CLASS_CONTIG)
    n_capped = sum(1 for t in capped if t.tig_class == CLASS_CONTIG)
    assert n_capped <= n_full + 1 and n_capped >= 1


def test_bat_memory_cap_keeps_mirrors(small_overlaps):
    """The per-read cap must preserve the symmetric-storage invariant:
    every kept a->b row has its b->a mirror (reference ovStore 'overlaps
    stored twice')."""
    _g, rs, st = small_overlaps
    from canu_tpu.graph.best_overlap import cap_store_rows

    capped = cap_store_rows(st, max(200, 4 * rs.n_reads))
    assert len(capped) < len(st)
    fwd = set(zip(capped.a_id.tolist(), capped.b_id.tolist(),
                  capped.a_bgn.tolist(), capped.a_end.tolist(),
                  capped.b_bgn.tolist(), capped.b_end.tolist()))
    rev = set(zip(capped.b_id.tolist(), capped.a_id.tolist(),
                  capped.b_bgn.tolist(), capped.b_end.tolist(),
                  capped.a_bgn.tolist(), capped.a_end.tolist()))
    assert fwd == rev
    assert len(capped) % 2 == 0


def test_log_file_flags(small_overlaps, tmp_path):
    """logFileFlags: flag-gated per-phase graph log files (bogart
    AS_BAT_Logging.H role)."""
    _g, rs, st = small_overlaps
    from canu_tpu.graph import build_unitigs

    ld = str(tmp_path / "logs")
    build_unitigs(st, rs.length, max_erate=0.2, log_dir=ld,
                  log_flags=frozenset({"bestedges", "tigs"}))
    be = open(os.path.join(ld, "best.edges.log")).read().splitlines()
    assert be[0].startswith("#read") and len(be) == rs.n_reads + 1
    tg = open(os.path.join(ld, "tigs.log")).read().splitlines()
    assert tg[0].startswith("#tig") and len(tg) >= 2


def test_show_next(tmp_path):
    """showNext reports the next stage and stops without running it."""
    from canu_tpu.io.fastx import write_fasta

    g = random_genome(20_000, seed=72)
    rs, _ = simulate_reads(g, coverage=3, mean_len=2000, min_len=1500,
                           max_len=3000, error_rate=0.02, seed=73,
                           circular=False)
    fa = os.path.join(tmp_path, "r.fasta")
    write_fasta(fa, ((f"read{i}", rs.get_seq(i))
                     for i in range(1, rs.n_reads + 1)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "canu_tpu", "-p", "x", "-d",
         str(tmp_path / "wd"), "genomeSize=20k", "showNext=true",
         "-pacbio-raw", fa],
        capture_output=True, text=True, timeout=300, env=env, cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    assert "next stage: cor-gatekeeper" in r.stdout, r.stdout[-500:]
    assert not os.path.exists(tmp_path / "wd" / "x.contigs.fasta")
