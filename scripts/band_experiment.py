"""Measure band-width sensitivity of the two dominant walls on the chip.

The r5 warm E. coli profile (`BASELINE.md` round-5 section) shows
cor-overlap verify (band 256, partial) at 830 s and OEA (RED band 256 +
adjust band 128 on corrected reads) at 1019 s — together 58% of the
critical path.  Both bands were chosen conservatively; the anchor-chain
band-centering (`ops/align.py` _band_centers) is designed to absorb
indel drift, so a narrower band may lose nothing.  This measures, on a
sim readset with KNOWN true overlaps:

  cor verify @ band 256 vs 128: wall, true-overlap recall, pair-set
     agreement, erate deltas on shared pairs;
  RED @ band 256 vs 128: wall, correction-set agreement.

Usage: python scripts/band_experiment.py [genome] [cov]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pair_key(a, b, M):
    a = a.astype(np.int64)
    b = b.astype(np.int64)
    return np.minimum(a, b) * M + np.maximum(a, b)


def main() -> None:
    gsize = int(float(sys.argv[1])) if len(sys.argv) > 1 else 400_000
    cov = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0

    from canu_tpu.ops import kmer as K
    from canu_tpu.ops import minhash as MH
    from canu_tpu.ops.align import verify_overlaps
    from canu_tpu.sim.simulate import random_genome, simulate_reads, true_overlaps

    g = random_genome(gsize, seed=11)
    rs, truth = simulate_reads(g, coverage=cov, mean_len=3500, min_len=1500,
                               max_len=7800, error_rate=0.10, seed=12)
    M = np.int64(rs.n_reads + 1)
    tru = true_overlaps(truth, min_overlap=500)
    tru_keys = np.unique(pair_key(tru[:, 0], tru[:, 1], M))
    print(f"# reads={rs.n_reads} true_pairs={len(tru_keys)}", flush=True)

    kc = K.count_readset_device(rs, k=16, block_size=256)
    fk = K.frequent_kmers(kc, distinct_fraction=0.9995)
    sk = MH.build_sketches(rs, k=16, n_hashes=512, frequent=fk, block_size=256)
    pairs = MH.find_candidates(sk, min_matches=2, block_size=1024)
    print(f"# candidates={len(pairs)}", flush=True)

    res = {}
    for band in (256, 128):
        # warm pass then timed pass (compiles amortize in the pipeline)
        for it in range(2):
            t0 = time.time()
            ov = verify_overlaps(rs, pairs, k=16, band=band, max_erate=0.30,
                                 min_overlap=500, chunk=512, min_shared=4,
                                 partial=True)
            dt = time.time() - t0
        keys = pair_key(ov.a_id, ov.b_id, M)
        uk, ui = np.unique(keys, return_index=True)
        rec = np.isin(tru_keys, uk).mean()
        res[band] = (dt, uk, ov.erate_q[ui], len(ov))
        print(f"cor-verify band={band}: warm {dt:.2f}s  rows={len(ov)} "
              f"pairs={len(uk)}  recall={rec:.4f}", flush=True)

    uk256, e256 = res[256][1], res[256][2]
    uk128, e128 = res[128][1], res[128][2]
    common, i1, i2 = np.intersect1d(uk256, uk128, return_indices=True)
    jac = len(common) / max(1, len(np.union1d(uk256, uk128)))
    de = (e128[i2].astype(np.int64) - e256[i1].astype(np.int64))
    print(f"# pair-set Jaccard 128 vs 256: {jac:.4f}; erate_q delta "
          f"mean {de.mean():.1f} p95 {np.percentile(np.abs(de), 95):.0f} "
          f"(q units of 1/65535)", flush=True)
    print(f"# speedup 256->128: {res[256][0]/res[128][0]:.2f}x", flush=True)

    # ---- RED on corrected-quality reads: use the raw rs as a proxy pile
    # (worst case for a narrow band; the pipeline's RED runs on corrected
    # reads where drift is far smaller)
    from canu_tpu.ops.oea import adjust_overlap_erates, detect_read_errors
    from canu_tpu.stores.overlaps import OverlapStore

    st = OverlapStore.build(verify_overlaps(
        rs, pairs, k=16, band=256, max_erate=0.30, min_overlap=500,
        chunk=512, min_shared=4, partial=False), rs.n_reads)
    print(f"# store rows={len(st)}", flush=True)
    for band in (256, 128):
        t0 = time.time()
        corr = detect_read_errors(rs, st, band=band)
        dt = time.time() - t0
        nfix = sum(len(v) for v in corr.values())
        res[("red", band)] = (dt, corr)
        print(f"RED band={band}: {dt:.2f}s  {nfix} fixes in {len(corr)} reads",
              flush=True)
    c256 = res[("red", 256)][1]
    c128 = res[("red", 128)][1]
    all_ids = set(c256) | set(c128)
    agree = sum(
        1 for rid in all_ids
        if rid in c256 and rid in c128
        and np.array_equal(c256[rid], c128[rid])
    )
    print(f"# RED agreement: {agree}/{len(all_ids)} reads identical; "
          f"speedup {res[('red', 256)][0]/res[('red', 128)][0]:.2f}x",
          flush=True)

    for band in (128, 64):
        t0 = time.time()
        adjust_overlap_erates(rs, st, c256, band=band, chunk=512,
                              only_changed=True)
        dt = time.time() - t0
        print(f"adjust band={band}: {dt:.2f}s", flush=True)


if __name__ == "__main__":
    main()
