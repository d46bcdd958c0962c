"""Worker for the 2-process FULL-pipeline test (test_multiprocess).

Each process joins the jax.distributed cluster and runs the ENTIRE
pipeline (correct -> trim -> assemble) SPMD on the same shared workdir:
collective stages (sharded meryl, ring candidates, process-sharded
verify, strided correction blocks) run on every process; writer-only
stages run on process 0 with the others held at the stage barriers
(pipeline.driver.run_stage coordination).
Run: python tests/mp_pipeline_worker.py <pid> <nprocs> <port>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid = int(sys.argv[1])
n_proc = int(sys.argv[2])
port = sys.argv[3]

from canu_tpu.parallel.launch import barrier, init_distributed

p, n = init_distributed(f"127.0.0.1:{port}", n_proc, pid)
import jax

assert n == n_proc and jax.process_count() == n_proc, (p, n)
print(f"[{pid}] joined: {jax.device_count()} global devices", flush=True)

import numpy as np

from canu_tpu.config.registry import Config
from canu_tpu.io import fastx
from canu_tpu.pipeline.driver import run_pipeline
from canu_tpu.sim.simulate import random_genome, simulate_reads

g = random_genome(30_000, seed=7)
rs, _ = simulate_reads(g, coverage=8, mean_len=2500, min_len=1500,
                       max_len=4000, error_rate=0.05, seed=8, circular=False)

raw = os.path.abspath("raw.fasta")
if pid == 0 and not os.path.exists(raw):
    fastx.write_fasta(
        raw + ".WORKING",
        ((f"read{i+1}", rs.get_seq(i + 1)) for i in range(rs.n_reads)),
    )
    os.replace(raw + ".WORKING", raw)
barrier("raw-fasta")

cfg = Config()
cfg.set("genomeSize", 30_000)
run_pipeline(os.path.abspath("mp_asm"), "asm", cfg, raw_reads=[raw])
barrier("pipeline-done")
if pid == 0:
    contigs = list(fastx.read_fastx(os.path.join("mp_asm", "asm.contigs.fasta")))
    print(f"[0] pipeline finished: {len(contigs)} contigs, "
          f"{sum(len(c.seq) for c in contigs)} bases", flush=True)
    print("MP_PIPELINE_OK", flush=True)
