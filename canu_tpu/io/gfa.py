"""GFA v1 assembly graph output (bogart TigGraph / alignGFA equivalent).

The reference emits unitigs.gfa/contigs.gfa from the tig end-to-end
overlap graph (/root/reference/src/bogart/AS_BAT_TigGraph.C) and later
recomputes edge overlaps against consensus sequences
(/root/reference/src/gfa/alignGFA.C).  Here edges come from verified
overlaps between tig END reads: if the terminal read of tig X dovetails
to a terminal read of tig Y, the tigs are linked with the overlap length
as a <n>M CIGAR.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..stores.overlaps import OverlapStore
from ..stores.readset import ReadSet
from ..stores.tigs import CLASS_CONTIG, TigStore
from ..utils import bitpack


def _end_reads(tig):
    """(first_read, first_rev, last_read, last_rev) by tig coordinate."""
    i0 = int(np.argmin(tig.bgn))
    i1 = int(np.argmax(tig.end))
    return (
        int(tig.read_id[i0]), bool(tig.rev[i0]),
        int(tig.read_id[i1]), bool(tig.rev[i1]),
    )


def write_gfa(
    path: str | os.PathLike,
    tigs: TigStore,
    readset: ReadSet,
    store: Optional[OverlapStore] = None,
    contigs_only: bool = True,
) -> int:
    """Write tigs (S lines) + inter-tig overlap links (L lines)."""
    path = os.fspath(path)
    chosen = [t for t in tigs if (not contigs_only) or t.tig_class == CLASS_CONTIG]
    # read -> (tig, which end, read orientation in tig)
    end_of: dict[int, list[tuple[int, str, bool]]] = {}
    names: dict[int, str] = {}
    for t in chosen:
        names[t.tig_id] = f"tig{t.tig_id:08d}"
        r0, rev0, r1, rev1 = _end_reads(t)
        end_of.setdefault(r0, []).append((t.tig_id, "bgn", rev0))
        if r1 != r0:
            end_of.setdefault(r1, []).append((t.tig_id, "end", rev1))

    n = 0
    links: set[tuple] = set()
    with open(path + ".WORKING", "w") as fh:
        fh.write("H\tVN:Z:1.0\n")
        for t in chosen:
            seq = bitpack.codes_to_seq(t.consensus) if t.consensus is not None else "*"
            ln = t.length
            fh.write(f"S\t{names[t.tig_id]}\t{seq}\tLN:i:{ln}\n")
            n += 1
        if store is not None:
            for rid, wh in end_of.items():
                o = store.overlaps_for(rid)
                for row in range(len(o["a_id"])):
                    b = int(o["b_id"][row])
                    if b not in end_of:
                        continue
                    for ta, enda, reva in wh:
                        for tb, endb, revb in end_of[b]:
                            if ta == tb:
                                continue
                            ov_len = int(o["a_end"][row] - o["a_bgn"][row])
                            # orientation: leaving ta via its end means '+'
                            oa = "+" if (enda == "end") != reva else "-"
                            ob = "+" if (endb == "bgn") != (revb ^ bool(o["flipped"][row])) else "-"
                            key = tuple(sorted([(ta, oa), (tb, ob)])) + (ov_len,)
                            if key in links:
                                continue
                            links.add(key)
                            fh.write(
                                f"L\t{names[ta]}\t{oa}\t{names[tb]}\t{ob}\t{ov_len}M\n"
                            )
    os.replace(path + ".WORKING", path)
    return n
