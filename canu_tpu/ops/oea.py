"""Overlap error adjustment: RED + OEA (findErrors / correctOverlaps).

Re-implements the reference's assembly-phase error adjustment:

  * findErrors ("RED", /root/reference/src/overlapErrorAdjustment/
    findErrors.C:374-510): every read is re-examined against its overlap
    pile; positions where the evidence plurality contradicts the read's
    own base with enough support (Vote_Qualify) are recorded as
    corrections;
  * correctOverlaps ("OEA", /root/reference/src/overlapErrorAdjustment/
    correctOverlaps.C:156-215): corrections are applied to BOTH reads of
    every overlap and the alignment is recomputed; the revised erates
    become the overlap store's `evalues` sidecar
    (OverlapErrorAdjustment.pm:632 updateOverlapStore).

TPU shape: RED reuses the correction voting machinery (batched fwd+bwd
banded DPs + vectorized vote accumulation); corrections are
SUBSTITUTION-only (indels were already handled by falcon correction
upstream; the reference's indel votes mostly fire on raw reads).  OEA
then rebuilds the corrected reads, re-verifies every overlap with the
Myers kernel in one batch, and returns the new fixed-point erates.

The payoff matches the reference's: adjusted erates approximate TRUE
sequence divergence (net of correctable sequencing error), which lets
bogart's deviation filters separate repeats at much tighter thresholds.
"""

from __future__ import annotations

import numpy as np

from ..stores.overlaps import OverlapStore
from ..stores.readset import ReadSet
from .falcon import evidence_jobs, _pow2_at_least
from .voting import VoteArrays, run_alignment_batches


def detect_read_errors(
    rs: ReadSet,
    st: OverlapStore,
    max_evidence_coverage: int = 40,
    min_alt_votes: int = 4,
    max_own_votes: int = 1,
    band: int = 256,
    batch: int = 64,
) -> dict[int, np.ndarray]:
    """RED: per-read substitution corrections from overlap-pile votes.

    Returns {read_id: int32[M, 2] of (position, corrected_base_code)}.
    A position is corrected when an alternative base gets >=
    min_alt_votes while the read's own base keeps <= max_own_votes
    (the Vote_Qualify support test of findErrors.C).
    """
    per = st.n_overlaps_per_read()  # per[i] = overlaps of read i+1
    ids = (np.flatnonzero(per > 0) + 1).astype(np.int64)
    if len(ids) == 0:
        return {}
    jobs = evidence_jobs(rs, st, ids, max_evidence_coverage, 0)
    if not jobs:
        return {}
    n_rows = _pow2_at_least(max(int(rs.length.max()), 256))
    votes_of: dict[int, VoteArrays] = {}
    for tid, _, _, _ in jobs:
        if tid not in votes_of:
            votes_of[tid] = VoteArrays.zeros(int(rs.length[tid - 1]))
    run_alignment_batches(jobs, votes_of, band, n_rows, batch)

    out: dict[int, np.ndarray] = {}
    for tid, v in votes_of.items():
        own = rs.get_codes(tid).astype(np.int64)
        base = v.base  # [t_len, 4]
        alt = np.argmax(base, axis=1)
        alt_votes = base[np.arange(len(own)), alt]
        own_votes = base[np.arange(len(own)), own]
        fix = (
            (alt != own)
            & (alt_votes >= min_alt_votes)
            & (own_votes <= max_own_votes)
            & (v.dele < alt_votes)  # a stronger deletion vote vetoes a sub
        )
        pos = np.flatnonzero(fix)
        if len(pos):
            out[tid] = np.stack([pos, alt[pos]], axis=1).astype(np.int32)
    return out


def apply_corrections(rs: ReadSet, corrections: dict[int, np.ndarray]) -> ReadSet:
    """Corrected copy of the read set (substitutions in place, so all
    overlap coordinates stay valid — the property OEA relies on)."""
    codes = []
    for rid in range(1, rs.n_reads + 1):
        c = rs.get_codes(rid).copy()
        fix = corrections.get(rid)
        if fix is not None and len(fix):
            c[fix[:, 0]] = fix[:, 1].astype(np.uint8)
        codes.append(c)
    names = [rs.name(i) for i in range(1, rs.n_reads + 1)]
    return ReadSet.from_codes_list(codes, names)


def adjust_overlap_erates(
    rs: ReadSet,
    st: OverlapStore,
    corrections: dict[int, np.ndarray],
    band: int = 128,
    chunk: int = 512,
    engine: str | None = None,
) -> np.ndarray:
    """OEA: re-verify every overlap between corrected reads.

    Returns the new uint16 erate_q array aligned with the store's rows
    (both mirror copies), ready for st.update_erates — the evalues
    sidecar install of the reference.
    """
    from .align import verify_overlaps
    from .minhash import OverlapCandidates

    if not len(st.a_id):
        return st.erate_q.copy()
    rs_fixed = apply_corrections(rs, corrections)
    half = st.a_id < st.b_id  # one direction; mirror rows share the erate
    z = np.zeros(int(half.sum()), np.int32)
    cand = OverlapCandidates(
        a_id=st.a_id[half].astype(np.int32),
        b_id=st.b_id[half].astype(np.int32),
        flipped=st.flipped[half],
        diag=z, n_shared=z, a_lo=z, a_hi=z, b_lo=z, b_hi=z,
    )
    ov = verify_overlaps(
        rs_fixed, cand, band=band, max_erate=1.0, min_overlap=0,
        chunk=chunk, engine=engine,
    )
    new_q = {}
    for i in range(len(ov)):
        key = (int(ov.a_id[i]), int(ov.b_id[i]))
        new_q[key] = int(ov.erate_q[i])
    out = st.erate_q.copy()
    for r in range(len(st.a_id)):
        a, b = int(st.a_id[r]), int(st.b_id[r])
        q = new_q.get((a, b) if a < b else (b, a))
        if q is not None:
            # only ever lower an erate: corrections must not worsen pairs
            # the re-verification happened to band differently
            out[r] = min(int(out[r]), q)
    return out
