"""Profile the correction vote engine on the real chip.

VERDICT r2 task 1(a): measure, per vote block, compile / execute /
fetch separately, on the stalled 1 Mb run's real stores.  The engine
now runs on the canonical segment geometry (falcon.VOTE_SEG); this
script times the first pile_votes dispatch (compile+execute), then
whole blocks end-to-end through correct_reads_blocks.

Usage: python scripts/profile_votes.py [store_dir] [n_blocks]
Default store_dir = _scale/run1m/correction.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    sd = sys.argv[1] if len(sys.argv) > 1 else "_scale/run1m/correction"
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax

    from canu_tpu.ops import falcon
    from canu_tpu.ops.votepile import device_words
    from canu_tpu.stores.overlaps import OverlapStore
    from canu_tpu.stores.readset import ReadSet

    print(f"# device: {jax.devices()[0].device_kind}  "
          f"VOTE_SEG={falcon.VOTE_SEG}", flush=True)
    rs = ReadSet.load(os.path.join(sd, "asm.gkpStore"))
    st = OverlapStore.load(os.path.join(sd, "asm.ovlStore"))
    print(f"# reads={rs.n_reads} overlaps={st.n_overlaps}", flush=True)

    t0 = time.time()
    words_d, _len_d = device_words(rs)
    jax.block_until_ready(words_d)
    print(f"# evidence plane up: {time.time()-t0:.1f}s "
          f"shape={words_d.shape}", flush=True)

    t0 = time.time()
    done = 0
    reads_out = 0
    for bi, items in falcon.correct_reads_blocks(
        rs, st, genome_size=1_000_000, out_coverage=40,
        max_evidence_coverage=40, qv_weight=False,
    ):
        dt = time.time() - t0
        reads_out += len(items)
        bases = sum(len(s) for _n, s in items)
        print(f"# block {bi}: {dt:.1f}s -> {len(items)} reads "
              f"{bases} bases (total {reads_out})", flush=True)
        done += 1
        if done >= n_blocks:
            break
        t0 = time.time()


if __name__ == "__main__":
    main()
