"""Chunk-level timing of the segmented vote engine on real data.

Breaks one correction block into its pile_votes dispatches and times
each with a device sync, separating: packed-upload, dispatch+execute,
finalize, fetch.  Usage: python scripts/profile_chunks.py [n_chunks]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

n_limit = int(sys.argv[1]) if len(sys.argv) > 1 else 6

import jax
import jax.numpy as jnp

from canu_tpu.ops import falcon
from canu_tpu.ops.votepile import (
    CHUNK_CELL_BUDGET,
    _COL_FIELDS,
    _finalize_plurality,
    _vote_many,
    device_words,
)
from canu_tpu.stores.overlaps import OverlapStore
from canu_tpu.stores.readset import ReadSet

sd = sys.argv[2] if len(sys.argv) > 2 else "_scale/run1m_v4/correction"
rs = ReadSet.load(os.path.join(sd, "asm.gkpStore"))
st = OverlapStore.load(os.path.join(sd, "asm.ovlStore"))
template_ids = falcon.select_templates(rs, 1_000_000, 40)
rows = falcon.select_evidence_rows(st, template_ids, rs.length, 40, 0)
jobs = falcon.evidence_vote_jobs(st, rows, rs.length)

S = falcon.VOTE_SEG
G = 256
tl, nseg, row0 = falcon._segment_table(rs.length, template_ids, S)
tpos = np.zeros(rs.n_reads + 1, np.int64)
tpos[template_ids] = np.arange(len(template_ids))

t0 = time.time()
t_words, t_len_d, seg_len, pad_row = falcon._segment_plane(
    rs, template_ids, nseg, row0, S)
jax.block_until_ready(t_words)
print(f"# segment plane: {time.time()-t0:.1f}s rows={t_words.shape}", flush=True)

t0 = time.time()
sjobs = falcon._segment_jobs(jobs, row0, tpos, S, falcon.VOTE_SEG_SLACK)
print(f"# segment jobs: {len(jobs)} -> {len(sjobs)} ({time.time()-t0:.1f}s)",
      flush=True)

words_d, len_d = device_words(rs)
jax.block_until_ready(words_d)

# take the first G segment rows' jobs (chapter 0 of block 0)
blocks = falcon._pack_template_blocks(template_ids, tl, nseg, G)
tsel = blocks[0]
seg_rows = np.concatenate([np.arange(row0[i], row0[i] + nseg[i]) for i in tsel])
ch = seg_rows[:G]
slot_map = np.full(int(row0[-1]), -1, np.int32)
slot_map[ch] = np.arange(len(ch), dtype=np.int32)
sel = np.flatnonzero(slot_map[sjobs.t_idx] >= 0)
print(f"# chapter0: {len(ch)} segs, {len(sel)} jobs", flush=True)

n_rows = S
B = max(32, min(256, CHUNK_CELL_BUDGET // n_rows))
band = 256
n = len(sel)
C_total = -(-n // B)
packed = np.zeros((C_total, 9, B), np.int32)
pad_n = C_total * B - n
for fi, f in enumerate(_COL_FIELDS):
    if f == "slot":
        v = slot_map[sjobs.t_idx[sel]]
    elif f == "weight":
        v = np.ones(n, np.float32).view(np.int32)
    else:
        v = getattr(sjobs, f)[sel].astype(np.int32)
    if pad_n:
        v = np.concatenate([v, np.zeros(pad_n, np.int32)])
    packed[:, fi, :] = v.reshape(C_total, B)
print(f"# B={B} C_total={C_total}", flush=True)

votes = jnp.zeros((G, 15, S), jnp.float32)
t0 = time.time()
compiled = _vote_many.lower(
    votes, t_words, t_len_d, words_d, len_d,
    jnp.zeros((9, B), jnp.int32), band, n_rows, S, G, True,
).compile()
print(f"# compile: {time.time()-t0:.1f}s", flush=True)

for c in range(min(n_limit, C_total)):
    t0 = time.time()
    chunk = jnp.asarray(packed[c])
    jax.block_until_ready(chunk)
    t_up = time.time() - t0
    t0 = time.time()
    votes = compiled(votes, t_words, t_len_d, words_d, len_d, chunk)
    jax.block_until_ready(votes)
    t_ex = time.time() - t0
    print(f"# chunk {c}: upload {t_up*1e3:.0f}ms execute {t_ex:.2f}s",
          flush=True)

t0 = time.time()
t_idx_block = np.full(G, pad_row, np.int32)
t_idx_block[: len(ch)] = ch
pk, _cov = _finalize_plurality(t_words, t_len_d, jnp.asarray(t_idx_block),
                               votes, 4.0, S, False)
jax.block_until_ready(pk)
print(f"# finalize: {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
host = np.asarray(pk)
print(f"# fetch {host.nbytes/1e6:.1f}MB: {time.time()-t0:.2f}s", flush=True)
print(f"# => est chapter execute {C_total} chunks; total segjobs {len(sjobs)} "
      f"-> {-(-len(sjobs)//B)} chunks for the whole run", flush=True)
