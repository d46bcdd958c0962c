"""Time the compiled reference Canu v1.6 end-to-end on the SAME
simulated input scale_run.py uses, for the side-by-side wall-clock
table (BASELINE.md).

The reference runs its full raw pipeline (correction + trimming +
assembly) with overlapInCore as every stage's overlapper
(corOverlapper=ovl bypasses the vendored MHAP jar's JVM requirement,
/root/reference/src/pipelines/canu.pl checkJava) on useGrid=false.
Built binaries come from scripts/build_reference.sh.

Usage: python scripts/reference_e2e.py [genome_size] [coverage] [workdir]
Writes <workdir>/result.json with wall seconds + assembly judgement.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REF_BIN = os.environ.get("CANU_TPU_REF_BIN", "/tmp/refbuild/Linux-amd64/bin")


def main() -> None:
    gsize = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    cov = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
    wd = sys.argv[3] if len(sys.argv) > 3 else "_scale/ref1m"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from canu_tpu.io import fastx
    from canu_tpu.sim.simulate import random_genome, simulate_reads
    from canu_tpu.utils import bitpack

    os.makedirs(wd, exist_ok=True)
    # EXACT scale_run.py input: same seeds, same read profile
    g = random_genome(gsize, seed=7)
    rs, _ = simulate_reads(
        g, coverage=cov, mean_len=3500, min_len=1500, max_len=7800,
        error_rate=0.10, seed=8,
    )
    raw_fa = os.path.join(wd, "raw.fasta")
    if not os.path.exists(raw_fa):
        fastx.write_fasta(
            raw_fa,
            ((f"read{i+1}", rs.get_seq(i + 1)) for i in range(rs.n_reads)),
        )
    print(f"# sim: {rs.n_reads} reads, {rs.total_bases} bases", flush=True)

    nthr = os.cpu_count() or 2
    t1 = time.time()
    r = subprocess.run(
        [os.path.join(REF_BIN, "canu"), "-p", "asm", "-d",
         os.path.join(wd, "ref"), f"genomeSize={gsize}",
         "useGrid=false", "gnuplotTested=true",
         "corOverlapper=ovl", "obtOverlapper=ovl", "utgOverlapper=ovl",
         f"maxThreads={nthr}", "maxMemory=32",
         # per-stage minimum-thread asks exceed this box's 2 cores
         f"corThreads={nthr}", f"cnsThreads={nthr}", f"redThreads={nthr}",
         f"oeaThreads={nthr}", f"batThreads={nthr}", f"ovlThreads={nthr}",
         "-pacbio-raw", os.path.abspath(raw_fa)],
        text=True,
    )
    wall = time.time() - t1
    print(f"# reference canu rc={r.returncode} wall {wall:.1f}s", flush=True)
    res = {
        "genome": gsize, "coverage": cov, "reads": rs.n_reads,
        "bases": rs.total_bases, "wall_s": round(wall, 1),
        "rc": r.returncode, "threads": nthr,
    }
    ctg = os.path.join(wd, "ref", "asm.contigs.fasta")
    if r.returncode == 0 and os.path.exists(ctg):
        from canu_tpu.sim.bogus import evaluate_assembly

        contigs = list(fastx.read_fastx(ctg))
        res["n_contigs"] = len(contigs)
        try:
            ev = evaluate_assembly(
                g, [bitpack.seq_to_codes(c.seq) for c in contigs], k=21,
                circular=True,
            )
            print("# " + ev.summary(), flush=True)
            res.update({
                "ng50": ev.contig_ng50,
                "genome_fraction": round(ev.genome_fraction, 4),
                "misjoins": ev.n_misjoins,
                "identity": round(ev.identity, 5),
            })
        except Exception as e:
            res["eval_error"] = str(e)[:200]
    with open(os.path.join(wd, "result.json"), "w") as fh:
        json.dump(res, fh)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
