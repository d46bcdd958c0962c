"""Does donate_argnums cause the 21.5s/chunk slowdown?  Real planes +
real jobs; AOT no-donate wrapper vs the donating _vote_many."""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from canu_tpu.ops import falcon
from canu_tpu.ops.votepile import (
    CHUNK_CELL_BUDGET,
    _COL_FIELDS,
    _vote_chunk_core,
    _vote_many,
    device_words,
)
from canu_tpu.stores.overlaps import OverlapStore
from canu_tpu.stores.readset import ReadSet

sd = "_scale/run1m/correction"
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
t_words, t_len_d, seg_len, pad_row = falcon._segment_plane(
    rs, template_ids, nseg, row0, S)
sjobs = falcon._segment_jobs(jobs, row0, tpos, S, falcon.VOTE_SEG_SLACK)
words_d, len_d = device_words(rs)
jax.block_until_ready(words_d)

n_rows = S
B = int(sys.argv[1]) if len(sys.argv) > 1 else max(32, min(256, CHUNK_CELL_BUDGET // n_rows))
band = 256
n = 8 * B
packed = np.zeros((8, 9, B), np.int32)
for fi, f in enumerate(_COL_FIELDS):
    if f == "slot":
        v = (sjobs.t_idx[:n] % G).astype(np.int32)
    elif f == "weight":
        v = np.ones(n, np.float32).view(np.int32)
    else:
        v = getattr(sjobs, f)[:n].astype(np.int32)
    packed[:, fi, :] = v.reshape(8, B)
chunks = [jnp.asarray(packed[c]) for c in range(8)]
jax.block_until_ready(chunks[0])


@partial(jax.jit, static_argnames=("band", "n_rows", "Lt", "G", "ends_free"))
def vote_nodonate(votes, tw, tlen, ew, elen, xs, band, n_rows, Lt, G,
                  ends_free=False):
    flipped = xs[6] != 0
    weight = jax.lax.bitcast_convert_type(xs[8], jnp.float32)
    return _vote_chunk_core(
        votes, tw, tlen, ew, elen,
        xs[0], xs[1], xs[2], xs[3], xs[4], xs[5], flipped, xs[7], weight,
        band=band, n_rows=n_rows, Lt=Lt, G=G, ends_free=ends_free,
    )


def bench(name, fn):
    votes = jnp.zeros((G, 15, S), jnp.float32)
    t0 = time.time()
    votes = fn(votes, chunks[0])
    s = float(jnp.sum(votes[:, 0, :1]))
    t_cold = time.time() - t0
    t0 = time.time()
    for c in range(1, 7):
        votes = fn(votes, chunks[c])
    s = float(jnp.sum(votes[:, 0, :1]))
    print(f"{name}: cold {t_cold:.1f}s then 6 chunks {time.time()-t0:.1f}s "
          f"= {(time.time()-t0)/6:.2f}s/chunk", flush=True)


bench("nodonate", lambda v, ch: vote_nodonate(
    v, t_words, t_len_d, words_d, len_d, ch, band, n_rows, S, G, True))
bench("donate  ", lambda v, ch: _vote_many(
    v, t_words, t_len_d, words_d, len_d, ch, band, n_rows, S, G, True))
