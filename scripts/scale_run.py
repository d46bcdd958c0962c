"""Bacterial-scale end-to-end run on the real chip.

Simulates a 1 Mb genome at 20x (PacBio-like 10% error, read profile
matched to bench.py so warm compile-cache buckets are reused), runs the
FULL pipeline (correct -> trim -> assemble), times each phase, and
judges the assembly against the truth genome with the bogus harness.

Usage: python scripts/scale_run.py [genome_size] [coverage] [workdir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    gsize = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    cov = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
    wd = sys.argv[3] if len(sys.argv) > 3 else "_scale/run1m"

    from canu_tpu.config import Config
    from canu_tpu.io import fastx
    from canu_tpu.pipeline.driver import run_pipeline
    from canu_tpu.sim.bogus import evaluate_assembly
    from canu_tpu.sim.simulate import random_genome, simulate_reads
    from canu_tpu.utils import bitpack

    os.makedirs(wd, exist_ok=True)
    t0 = time.time()
    g = random_genome(gsize, seed=7)
    rs, _ = simulate_reads(
        g, coverage=cov, mean_len=3500, min_len=1500, max_len=7800,
        error_rate=0.10, seed=8,
    )
    raw_fa = os.path.join(wd, "raw.fasta")
    fastx.write_fasta(
        raw_fa,
        ((f"read{i+1}", rs.get_seq(i + 1)) for i in range(rs.n_reads)),
    )
    print(
        f"# sim: {rs.n_reads} reads, {rs.total_bases} bases "
        f"({time.time()-t0:.1f}s)", flush=True,
    )

    cfg = Config()
    cfg.set("genomeSize", str(gsize))
    t1 = time.time()
    ctx = run_pipeline(wd, "asm", cfg, raw_reads=[raw_fa])
    wall = time.time() - t1
    print(f"# pipeline wall {wall:.1f}s", flush=True)

    contigs = list(fastx.read_fastx(os.path.join(wd, "asm.contigs.fasta")))
    ev = evaluate_assembly(
        g, [bitpack.seq_to_codes(c.seq) for c in contigs], k=21,
        circular=True,
    )
    print("# " + ev.summary(), flush=True)
    print(json.dumps({
        "genome": gsize, "coverage": cov, "reads": rs.n_reads,
        "bases": rs.total_bases, "wall_s": round(wall, 1),
        "n_contigs": len(contigs), "ng50": ev.contig_ng50,
        "ideal_ng50": ev.ideal_ng50,
        "genome_fraction": round(ev.genome_fraction, 4),
        "misjoins": ev.n_misjoins,
        "identity": round(ev.identity, 5),
    }), flush=True)


if __name__ == "__main__":
    main()
