"""Sweep verify-path batching knobs on the real chip.

Usage: python scripts/sweep_verify.py [chunk group [unroll]]
Runs the bench dataset's verify pass at the given chunk size and
MYERS_GROUP (and optional CANU_TPU_MYERS_UNROLL, which must be set
before import), printing warm timings.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 512
group = int(sys.argv[2]) if len(sys.argv) > 2 else 4
if len(sys.argv) > 3:
    os.environ["CANU_TPU_MYERS_UNROLL"] = sys.argv[3]

import jax  # noqa: E402

from canu_tpu.ops import align as AL  # noqa: E402
from canu_tpu.ops import kmer as K  # noqa: E402
from canu_tpu.ops import minhash as MH  # noqa: E402
from canu_tpu.sim.simulate import random_genome, simulate_reads  # noqa: E402

AL.MYERS_GROUP = group

print(f"# device={jax.devices()[0]} chunk={chunk} group={group} "
      f"unroll={os.environ.get('CANU_TPU_MYERS_UNROLL', '8')}", flush=True)

g = random_genome(300_000, seed=42)
rs, _ = simulate_reads(g, coverage=12, mean_len=3500, min_len=1500,
                       max_len=7800, error_rate=0.10, seed=43)
kc = K.count_readset_device(rs, k=16, block_size=128)
fk = K.frequent_kmers(kc, distinct_fraction=0.9995)
sk = MH.build_sketches(rs, k=16, n_hashes=512, frequent=fk, block_size=128)
pairs = MH.find_candidates(sk, min_matches=2, block_size=1024)
print(f"# candidates={len(pairs)}", flush=True)

for it in range(3):
    t0 = time.time()
    ov = AL.verify_overlaps(rs, pairs, band=128, max_erate=0.35,
                            min_overlap=500, chunk=chunk, min_shared=4)
    dt = time.time() - t0
    print(f"verify pass {it}: {dt:.2f}s  {len(ov)} overlaps  "
          f"{len(ov)/dt:.0f} ovl/s", flush=True)
