"""Interval coverage math (intervalList equivalent).

Replaces the reference's intervalList (/root/reference/src/AS_UTL/
intervalList.H — union/depth computations underlying trimReads,
filterCorrectionLayouts and bogus) with numpy event sweeps.
"""

from __future__ import annotations

import numpy as np


def coverage_depth_events(spans: np.ndarray):
    """spans int[n,2] -> (positions, depth_after_position) event sweep."""
    if len(spans) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    ev = np.concatenate([
        np.stack([spans[:, 0], np.ones(len(spans), dtype=spans.dtype)], axis=1),
        np.stack([spans[:, 1], -np.ones(len(spans), dtype=spans.dtype)], axis=1),
    ])
    order = np.lexsort((ev[:, 1], ev[:, 0]))
    ev = ev[order]
    pos = ev[:, 0].astype(np.int64)
    depth = np.cumsum(ev[:, 1]).astype(np.int64)
    return pos, depth


def covered_intervals(spans: np.ndarray, min_cov: int = 1) -> np.ndarray:
    """Maximal intervals with coverage >= min_cov. Returns int64[m, 2]."""
    pos, depth = coverage_depth_events(spans)
    out = []
    start = None
    for p, d in zip(pos, depth):
        if d >= min_cov and start is None:
            start = p
        elif d < min_cov and start is not None:
            if p > start:
                out.append((start, p))
            start = None
    # depth always returns to 0 at the last event, closing any interval
    return np.array(out, dtype=np.int64) if out else np.zeros((0, 2), np.int64)


def largest_covered(spans: np.ndarray, min_cov: int = 1) -> tuple[int, int]:
    """Largest interval covered >= min_cov (trimReads-largestCovered
    equivalent, /root/reference/src/overlapBasedTrimming/
    trimReads-largestCovered.C). Returns (bgn, end); (0, 0) if none."""
    iv = covered_intervals(spans, min_cov)
    if len(iv) == 0:
        return (0, 0)
    best = int(np.argmax(iv[:, 1] - iv[:, 0]))
    return int(iv[best, 0]), int(iv[best, 1])
