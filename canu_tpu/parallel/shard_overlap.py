"""Mesh-sharded pipeline stages: distributed meryl + ring all-vs-all
candidate discovery.

These are the functions `pipeline.stages` actually calls when more than
one device is visible (config `shardedCompute`), replacing the
reference's grid decomposition with XLA collectives:

  * k-mer counting: every shard extracts its local reads' k-mers and
    routes each to its owner shard by hash range with ONE all_to_all
    (parallel.mesh.sharded_kmer_count_step) — the reference's
    bucketize/sort/index disk shuffle (/root/reference/src/stores/
    ovStoreBucketizer.C, SURVEY §2.13(3)) as a single collective;
  * candidate discovery: sketches are sharded by read block over a 1-D
    mesh; each of ceil(n/2)+1 ring steps matches the local block against
    a block rotating through the mesh via ppermute, so per-device memory
    stays O(N/n) — this kills the all_gather-everything shortcut of the
    round-1 dryrun (the hash-block x query-block job matrix of
    /root/reference/src/pipelines/canu/OverlapMhap.pm:191-296, but the
    "jobs" are ring phases on a device mesh);
  * half-ring dedup: block pair (r, r') is matched exactly once —
    self-blocks keep i < j, the final step of an even ring keeps only
    r < r' — so the candidate SET is identical to the single-device
    block x block pass (tested).

Banded verification stays per-shard single-device code: each host
verifies the candidates its shard discovered with the standard engine
(ops.align.verify_overlaps); the candidate matrix was the O(N^2) part.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

UINT32_MAX = np.uint32(0xFFFFFFFF)


def default_mesh(n_devices: int | None = None) -> Mesh:
    from .mesh import make_shard_mesh

    return make_shard_mesh(n_devices)


# ---- distributed meryl -------------------------------------------------------


def _mesh_rows(readset, mesh: Mesh, W: int):
    """Row-sharded (words, lengths) device arrays over the mesh.

    Single-process: plain device arrays (shard_map splits them).
    Multi-process: each host builds ONLY ITS OWN contiguous row block
    (host-sharded read feeding — no host materializes the full padded
    plane) and the global array is assembled from per-process shards.
    """
    from jax.sharding import NamedSharding

    n = mesh.devices.size
    N = readset.n_reads
    Npad = -(-max(N, 1) // n) * n
    pc = jax.process_count()
    if pc == 1:
        words, lengths = readset.block_words(
            np.arange(1, N + 1, dtype=np.int64), W)
        if Npad > N:
            words = np.vstack([words, np.zeros((Npad - N, W), np.uint32)])
            lengths = np.concatenate(
                [lengths, np.zeros(Npad - N, np.int32)])
        return jnp.asarray(words), jnp.asarray(lengths), Npad
    assert Npad % pc == 0 and n % pc == 0
    per = Npad // pc
    p = jax.process_index()
    r0 = p * per
    ids = np.arange(r0 + 1, min(r0 + per, N) + 1, dtype=np.int64)
    if len(ids):
        words, lengths = readset.block_words(ids, W)
    else:
        words = np.zeros((0, W), np.uint32)
        lengths = np.zeros(0, np.int32)
    if len(ids) < per:
        words = np.vstack(
            [words, np.zeros((per - len(ids), W), np.uint32)])
        lengths = np.concatenate(
            [lengths, np.zeros(per - len(ids), np.int32)])
    wg = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("s", None)), words, (Npad, W))
    lg = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("s")), lengths, (Npad,))
    return wg, lg, Npad


def _host_full(x):
    """Full host copy of a (possibly cross-process sharded) array."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def sharded_count_readset(readset, k: int = 16, mesh: Mesh | None = None,
                          bin_capacity: int = 0):
    """Distributed k-mer counting; returns a host KmerCounts identical to
    the single-device count (hash-range routing makes local counts
    global).  The multi-host meryl of SURVEY §2.13; k <= 16 counts one
    uint32 lane, 16 < k <= 32 exact 2-lane (the reference's ovl/utg
    k=22)."""
    from ..ops.kmer import INVALID_KMER, KmerCounts
    from ..utils.bitpack import n_words
    from .mesh import sharded_kmer_count_step, sharded_kmer_count_step2

    mesh = mesh or default_mesh()
    W = 1 << max(0, int(n_words(max(1, readset.max_length)) - 1).bit_length())
    words, lengths, _Npad = _mesh_rows(readset, mesh, W)
    if k > 16:
        step = sharded_kmer_count_step2(mesh, k=k, bin_capacity=bin_capacity)
        hi, lo, ct, hist, dropped = step(words, lengths)
        if int(_host_full(dropped)) > 0:
            raise RuntimeError("sharded k-mer count dropped k-mers; "
                               "raise bin_capacity")
        hi = _host_full(hi).reshape(-1).astype(np.uint64)
        lo = _host_full(lo).reshape(-1).astype(np.uint64)
        ct = _host_full(ct).reshape(-1)
        km = (hi << np.uint64(32)) | lo
        keep = (km != np.uint64(0xFFFFFFFFFFFFFFFF)) & (ct > 0)
        km, ct = km[keep], ct[keep].astype(np.int64)
        order = np.argsort(km, kind="stable")
        return KmerCounts(k, km[order], ct[order])
    step = sharded_kmer_count_step(mesh, k=k, bin_capacity=bin_capacity)
    km, ct, hist, dropped = step(words, lengths)
    if int(_host_full(dropped)) > 0:
        raise RuntimeError(
            f"sharded k-mer count dropped k-mers; raise bin_capacity"
        )
    km = _host_full(km).reshape(-1)
    ct = _host_full(ct).reshape(-1)
    keep = (km != INVALID_KMER) & (ct > 0)
    km, ct = km[keep], ct[keep].astype(np.int64)
    order = np.argsort(km, kind="stable")
    return KmerCounts(k, km[order], ct[order])


# ---- ring all-vs-all candidates ---------------------------------------------


def _ring_step_fn(mesh: Mesh, B_loc: int, H: int, min_matches: int,
                  cap: int, n: int):
    T = n // 2 + 1  # half ring + self step covers every block pair once

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("s", None),),
        out_specs=(P("s", None), P("s")),
        check_vma=False,
    )
    def step(sk_local):
        my_r = jax.lax.axis_index("s")
        perm = [((i + 1) % n, i) for i in range(n)]  # shift blocks down

        def match(SA, SB):
            def body(h, acc):
                a = SA[:, h]
                b = SB[:, h]
                eq = (a[:, None] == b[None, :]) & (a != UINT32_MAX)[:, None]
                return acc + eq.astype(jnp.int32)

            return jax.lax.fori_loop(
                0, H, body, jnp.zeros((B_loc, B_loc), jnp.int32)
            )

        def body(t, carry):
            rot, out, nfound = carry
            cnt = match(sk_local, rot)
            mask = cnt >= min_matches
            ii = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)
            src = (my_r + t) % n
            # dedup: self block i<j; last step of an even ring only r<src
            mask = jnp.where(t == 0, mask & (ii < jj), mask)
            emit = (t < (n + 1) // 2) | (my_r < src)
            mask = mask & emit
            found = jnp.sum(mask.astype(jnp.int32))
            pi, pj = jnp.nonzero(mask, size=cap, fill_value=B_loc)
            live = pi < B_loc
            a_id = jnp.where(live, my_r * B_loc + pi + 1, 0)
            b_id = jnp.where(live, src * B_loc + pj + 1, 0)
            c = jnp.where(
                live,
                cnt[jnp.minimum(pi, B_loc - 1), jnp.minimum(pj, B_loc - 1)],
                0,
            )
            rows = jnp.stack([a_id, b_id, c], axis=1)  # [cap, 3]
            out = jax.lax.dynamic_update_slice(out, rows[None], (t, 0, 0))
            rot = jax.lax.ppermute(rot, "s", perm)
            return rot, out, jnp.maximum(nfound, found)

        out0 = jnp.zeros((T, cap, 3), jnp.int32)
        rot, out, nfound = jax.lax.fori_loop(
            0, T, body, (sk_local, out0, jnp.int32(0))
        )
        return out.reshape(T * cap, 3), nfound[None]

    return jax.jit(step)


def sharded_find_candidates(
    sketches: np.ndarray,
    min_matches: int = 3,
    mesh: Mesh | None = None,
    cap_per_step: int = 1 << 17,
) -> np.ndarray:
    """Ring all-vs-all candidate pairs over the mesh.

    Returns int64[M, 3] (a_id, b_id, slot_matches), a_id < b_id, sorted —
    the same contract (and the same SET) as ops.minhash.find_candidates.
    """
    mesh = mesh or default_mesh()
    n = mesh.devices.size
    N, H = sketches.shape
    B_loc = -(-max(N, 1) // n)
    Npad = B_loc * n
    if Npad > N:
        sketches = np.vstack([
            sketches,
            np.full((Npad - N, H), UINT32_MAX, np.uint32),
        ])
    step = _ring_step_fn(mesh, B_loc, H, min_matches, cap_per_step, n)
    if jax.process_count() > 1:
        from jax.sharding import NamedSharding

        per = Npad // jax.process_count()
        p = jax.process_index()
        sk_g = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("s", None)),
            sketches[p * per : (p + 1) * per], (Npad, H))
        out, nfound = step(sk_g)
    else:
        out, nfound = step(jnp.asarray(sketches))
    out = _host_full(out)
    nfound = _host_full(nfound)
    worst = int(np.asarray(nfound).max())
    if worst > cap_per_step:
        raise RuntimeError(
            f"candidate overflow in ring step: {worst} > cap={cap_per_step}"
        )
    rows = np.asarray(out).astype(np.int64)
    rows = rows[rows[:, 0] > 0]
    rows = rows[rows[:, 1] <= N]  # drop pairs into padding rows
    rows = rows[rows[:, 0] <= N]
    flip = rows[:, 0] > rows[:, 1]
    rows[flip, 0], rows[flip, 1] = rows[flip, 1], rows[flip, 0]
    return rows[np.lexsort((rows[:, 1], rows[:, 0]))]


# ---- sharded banded verification --------------------------------------------


def sharded_verify_candidates(
    readset,
    pairs: np.ndarray,
    mesh: Mesh | None = None,
    k: int = 16,
    band: int = 128,
):
    """Banded verification sharded by candidate ownership.

    Each device verifies its contiguous slice of the candidate list with
    the same anchor+extension kernel the single-device path uses
    (ops.align._verify_kernel, engine='xla' — pure jax, so it runs
    inside shard_map); the read-index planes are replicated (at pod
    scale they are the small side: packed words + minimizer tables).
    Returns the raw verification rows int32[M, 13] in candidate order —
    bit-identical to the single-device kernel on the same pairs.
    """
    from types import SimpleNamespace

    from ..ops.align import _verify_kernel
    from ..ops.minimizers import get_read_index

    mesh = mesh or default_mesh()
    n = mesh.devices.size
    index = get_read_index(readset, k=k)
    n_rows = index.words.shape[1] * 16
    M = len(pairs)
    per = -(-max(M, 1) // n)
    Mp = per * n
    pad_row = index.n_reads
    a_idx = np.full(Mp, pad_row, np.int32)
    b_idx = np.full(Mp, pad_row, np.int32)
    a_idx[:M] = pairs[:, 0] - 1
    b_idx[:M] = pairs[:, 1] - 1
    fl = np.zeros(Mp, bool)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P("s"), P("s"), P("s")),
        out_specs=P("s", None),
        check_vma=False,
    )
    def step(words, length, mker, mpos, mstr, ai, bi, flp):
        idx = SimpleNamespace(words=words, length=length, mker=mker,
                              mpos=mpos, mstr=mstr, n_reads=pad_row)
        return _verify_kernel(idx, ai, bi, flp, k, band, n_rows,
                              engine="xla", orient=True)

    out = jax.jit(step)(
        index.words, index.length, index.mker, index.mpos, index.mstr,
        jnp.asarray(a_idx), jnp.asarray(b_idx), jnp.asarray(fl),
    )
    return _host_full(out)[:M]


# ---- process-sharded full-featured verification ------------------------------


def allgather_overlap_table(table):
    """Exchange per-process OverlapTables; every process returns the
    concatenation over all processes (process order, stable).

    Records pack into int32[m, 8] (erate_q and flipped fit), rows are
    padded to the max per-process count (allgather needs equal shapes),
    and a leading count row strips the padding.  ~32 B/overlap on the
    wire — the cheap side of the exchange; the verification work it
    divides is ~10^4x larger."""
    from ..ops.align import OverlapTable

    if jax.process_count() == 1:
        return table
    from jax.experimental import multihost_utils

    m = len(table)
    packed = np.stack(
        [
            table.a_id.astype(np.int32),
            table.b_id.astype(np.int32),
            table.flipped.astype(np.int32),
            table.a_bgn.astype(np.int32),
            table.a_end.astype(np.int32),
            table.b_bgn.astype(np.int32),
            table.b_end.astype(np.int32),
            table.erate_q.astype(np.int32),
        ],
        axis=1,
    ) if m else np.zeros((0, 8), np.int32)
    counts = np.asarray(
        multihost_utils.process_allgather(np.asarray([m], np.int32), tiled=True)
    )
    cap = int(counts.max(initial=0))
    if cap == 0:
        return table
    pad = np.zeros((cap, 8), np.int32)
    pad[:m] = packed
    gathered = np.asarray(
        multihost_utils.process_allgather(pad, tiled=True)
    ).reshape(jax.process_count(), cap, 8)
    rows = np.concatenate(
        [gathered[p, : counts[p]] for p in range(jax.process_count())]
    )
    return OverlapTable(
        a_id=rows[:, 0].astype(np.int32),
        b_id=rows[:, 1].astype(np.int32),
        flipped=rows[:, 2].astype(bool),
        a_bgn=rows[:, 3].astype(np.int32),
        a_end=rows[:, 4].astype(np.int32),
        b_bgn=rows[:, 5].astype(np.int32),
        b_end=rows[:, 6].astype(np.int32),
        erate_q=rows[:, 7].astype(np.uint16),
    )


def table_to_sym_rows(table) -> np.ndarray:
    """Symmetrize an A->B OverlapTable into int32[2m, 8] store rows in
    stores.overlaps._COLS order (the 'every overlap stored twice'
    invariant applied BEFORE the range exchange, so each mirror row
    routes to its own a_id range owner)."""
    m = len(table)
    rows = np.empty((2 * m, 8), np.int32)
    rows[:m, 0] = table.a_id
    rows[m:, 0] = table.b_id
    rows[:m, 1] = table.b_id
    rows[m:, 1] = table.a_id
    rows[:m, 2] = table.flipped
    rows[m:, 2] = table.flipped
    rows[:m, 3] = table.a_bgn
    rows[m:, 3] = table.b_bgn
    rows[:m, 4] = table.a_end
    rows[m:, 4] = table.b_end
    rows[:m, 5] = table.b_bgn
    rows[m:, 5] = table.a_bgn
    rows[:m, 6] = table.b_end
    rows[m:, 6] = table.a_end
    rows[:m, 7] = table.erate_q
    rows[m:, 7] = table.erate_q
    return rows


def process_sharded_store_rows(readset, pairs: np.ndarray, **verify_kwargs):
    """Verify a process-strided candidate slice, symmetrize, and exchange
    by a_id range: returns int32[m_p, 8] rows owned by THIS process,
    fully sorted.  The memory-bounded replacement for
    process_sharded_verify + allgather: peak per-process table memory is
    O(total/n_processes), not O(total) (reference bucketize/sort build,
    SURVEY.md §3.3)."""
    from ..ops.align import verify_overlaps
    from .storesort import process_range_exchange

    pi, n = jax.process_index(), jax.process_count()
    local = pairs[pi::n] if n > 1 else pairs
    verify_kwargs.pop("sink", None)
    tab = verify_overlaps(readset, local, **verify_kwargs)
    rows = table_to_sym_rows(tab)
    del tab
    return process_range_exchange(rows, readset.n_reads)


def process_sharded_verify(readset, pairs: np.ndarray, **verify_kwargs):
    """Full-featured banded verification sharded BY PROCESS.

    Each process runs ops.align.verify_overlaps (partial overlaps,
    palindromic re-verify, engine selection — the whole pipeline
    surface) on a strided slice of the candidate list, then the verified
    tables are allgathered so every process holds the full store input.
    The strided slice keeps per-process length distributions similar
    (verify_overlaps sorts by length internally, so chunk occupancy
    stays homogeneous on every process).

    This is the reference's hash x ref job-matrix data parallelism
    (/root/reference/src/pipelines/canu/OverlapMhap.pm:191-296) applied
    to verification: independent slices, no communication until the
    store-input exchange (their filesystem shuffle, our allgather)."""
    from ..ops.align import verify_overlaps

    pi, n = jax.process_index(), jax.process_count()
    local = pairs[pi::n] if n > 1 else pairs
    verify_kwargs.pop("sink", None)  # sink is process-local; the caller
    # spills AFTER the exchange so the spill holds the full table
    tab = verify_overlaps(readset, local, **verify_kwargs)
    return allgather_overlap_table(tab)
