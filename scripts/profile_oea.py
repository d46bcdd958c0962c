"""Profile OEA (RED + erate adjust) on saved stores, on the real chip.

The r5 warm E. coli run measured oea at 1019 s — the #1 stage — but
the stage had no sub-instrumentation.  This re-runs detect_read_errors
and adjust_overlap_erates separately on the persisted unitigging
stores and reports where the time goes, plus the only_changed hit
rate (how many overlaps actually needed re-verification).

Usage: python scripts/profile_oea.py [unitigging_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    d = sys.argv[1] if len(sys.argv) > 1 else "_scale/ecoli_v3/unitigging"
    from canu_tpu.ops.oea import adjust_overlap_erates, detect_read_errors
    from canu_tpu.stores.overlaps import OverlapStore
    from canu_tpu.stores.readset import ReadSet

    rs = ReadSet.load(os.path.join(d, "asm.gkpStore"))
    st = OverlapStore.load(os.path.join(d, "asm.ovlStore"))
    print(f"# reads={rs.n_reads} store_rows={len(st)}", flush=True)

    t0 = time.time()
    corr = detect_read_errors(rs, st, band=256)
    t_red = time.time() - t0
    n_fix = sum(len(v) for v in corr.values())
    changed = np.zeros(st.n_reads + 1, bool)
    for rid in corr:
        changed[rid] = True
    touched = changed[st.a_id] | changed[st.b_id]
    print(f"# RED: {t_red:.1f}s — {n_fix} corrections in {len(corr)} "
          f"reads; touched overlaps {int(touched.sum())}/{len(st)} "
          f"({touched.mean():.1%})", flush=True)

    t0 = time.time()
    q_fast = adjust_overlap_erates(rs, st, corr, band=128, chunk=512,
                                   only_changed=True)
    t_fast = time.time() - t0
    print(f"# adjust only_changed: {t_fast:.1f}s", flush=True)

    t0 = time.time()
    q_full = adjust_overlap_erates(rs, st, corr, band=128, chunk=512,
                                   only_changed=False)
    t_full = time.time() - t0
    print(f"# adjust full: {t_full:.1f}s", flush=True)
    same = int((q_fast[touched] == q_full[touched]).sum())
    print(f"# touched-row erate agreement: {same}/{int(touched.sum())}",
          flush=True)
    print(f"# OEA wall = red {t_red:.1f} + adjust {t_fast:.1f} "
          f"(vs full {t_full:.1f})", flush=True)


if __name__ == "__main__":
    main()
