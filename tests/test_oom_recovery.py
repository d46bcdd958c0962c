"""OOM retry recovery: attempt 2 must run smaller and SUCCEED.

Round-3 failure mode: after a device RESOURCE_EXHAUSTED inside the
overlap stage, run_stage immediately re-invoked fn() in-process and
re-OOMed 4 ms later — the device still held every live buffer and the
verify window was unchanged.  The reference retries with fresh
processes, so its retries start clean
(/root/reference/src/pipelines/canu/Execution.pm:1036-1276).  These
tests inject a synthetic OOM and assert the recovery contract:
buffers freed, in-flight budget halved, caches rebuilt, stage done.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canu_tpu.config.registry import Config
from canu_tpu.ops import align as AL
from canu_tpu.pipeline.driver import make_ctx, run_stage
from canu_tpu.utils import runtime as RT


class FakeOOM(Exception):
    pass


def _fake_oom():
    return FakeOOM(
        "RESOURCE_EXHAUSTED: Out of memory while trying to allocate "
        "1234567890 bytes."
    )


def test_is_oom_error():
    assert RT.is_oom_error(_fake_oom())
    assert not RT.is_oom_error(ValueError("shape mismatch"))


def test_recover_frees_live_arrays_and_backs_off():
    before = AL._INFLIGHT_BACKOFF
    try:
        x = jnp.ones((256, 256))
        jax.block_until_ready(x)
        RT.recover_device_memory()
        assert x.is_deleted()
        assert AL._INFLIGHT_BACKOFF == pytest.approx(before * 0.5)
    finally:
        AL._INFLIGHT_BACKOFF = before


def test_read_index_cache_rebuilds_after_recovery():
    from canu_tpu.ops.minimizers import get_read_index
    from canu_tpu.sim.simulate import random_genome, simulate_reads

    g = random_genome(20_000, seed=7)
    rs, _ = simulate_reads(g, coverage=3, mean_len=2000, error_rate=0.05,
                           seed=7)
    idx1 = get_read_index(rs, k=16)
    before = AL._INFLIGHT_BACKOFF
    try:
        RT.recover_device_memory()
    finally:
        AL._INFLIGHT_BACKOFF = before
    assert idx1.words.is_deleted()
    idx2 = get_read_index(rs, k=16)  # must rebuild, not poison
    assert not idx2.words.is_deleted()
    jax.block_until_ready(idx2.words)


def test_run_stage_attempt2_succeeds_after_injected_oom(tmp_path):
    cfg = Config()
    ctx = make_ctx(str(tmp_path), "t", cfg)
    out = tmp_path / "out.txt"
    calls = {"n": 0}
    before = AL._INFLIGHT_BACKOFF
    baseline_budget = AL._max_in_flight(512, 8192, 128)

    def fn():
        calls["n"] += 1
        if calls["n"] == 1:
            # attempt 1: dirty the device, then die of OOM
            jax.block_until_ready(jnp.ones((128, 128)))
            raise _fake_oom()
        # attempt 2 must observe a strictly smaller verify window and a
        # usable device (allocations after recovery must work)
        assert AL._max_in_flight(512, 8192, 128) <= baseline_budget
        assert AL._INFLIGHT_BACKOFF < before
        jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
        out.write_text("done")

    try:
        run_stage(ctx, "oomtest", lambda: out.exists(), fn)
    finally:
        AL._INFLIGHT_BACKOFF = before
    assert calls["n"] == 2
    assert out.read_text() == "done"


@pytest.mark.slow
def test_overlap_stage_resumes_from_candidate_checkpoint(tmp_path):
    """An injected OOM mid-verify leaves the candidate checkpoint behind;
    the retry must consume it (no sketch recompute) and finish."""
    from canu_tpu.pipeline import stages as S
    from canu_tpu.sim.simulate import random_genome, simulate_reads

    g = random_genome(30_000, seed=3)
    rs, _ = simulate_reads(g, coverage=6, mean_len=2500, error_rate=0.03,
                           seed=3)
    cfg = Config()
    cfg.set("genomeSize", 30_000)
    ctx = make_ctx(str(tmp_path), "t", cfg)
    fk = S.meryl(ctx, "cor", rs)

    real_verify = AL.verify_overlaps
    calls = {"n": 0}

    def exploding_verify(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise _fake_oom()
        return real_verify(*a, **kw)

    before = AL._INFLIGHT_BACKOFF
    ckpt = os.path.join(str(tmp_path), "correction", "t.candidates.npy")
    try:
        AL.verify_overlaps = exploding_verify
        st = S.overlap(ctx, "cor", rs, fk)
    finally:
        AL.verify_overlaps = real_verify
        AL._INFLIGHT_BACKOFF = before
    assert calls["n"] == 2
    assert st.n_overlaps > 0
    # checkpoint consumed and cleaned up after the store landed
    assert not os.path.exists(ckpt)


@pytest.mark.slow
def test_verify_identical_under_tiny_inflight_budget():
    """Bounding the in-flight window must not change results."""
    from canu_tpu.ops import minhash as MH
    from canu_tpu.sim.simulate import random_genome, simulate_reads

    g = random_genome(40_000, seed=11)
    rs, _ = simulate_reads(g, coverage=6, mean_len=2500, error_rate=0.05,
                           seed=11)
    sk = MH.build_sketches(rs, k=16, n_hashes=128)
    pairs = MH.find_candidates(sk, min_matches=3)
    if len(pairs) == 0:
        pytest.skip("no candidates in sim")
    t_full = AL.verify_overlaps(rs, pairs, k=16, chunk=64)
    old_mb, old_bo = AL.INFLIGHT_MB, AL._INFLIGHT_BACKOFF
    try:
        AL.INFLIGHT_MB = 1.0  # floor: 2*MYERS_GROUP chunks
        AL._INFLIGHT_BACKOFF = 1.0
        t_tiny = AL.verify_overlaps(rs, pairs, k=16, chunk=64)
    finally:
        AL.INFLIGHT_MB, AL._INFLIGHT_BACKOFF = old_mb, old_bo
    np.testing.assert_array_equal(t_full.a_id, t_tiny.a_id)
    np.testing.assert_array_equal(t_full.b_id, t_tiny.b_id)
    np.testing.assert_array_equal(t_full.a_bgn, t_tiny.a_bgn)
    np.testing.assert_array_equal(t_full.a_end, t_tiny.a_end)
    np.testing.assert_array_equal(t_full.erate_q, t_tiny.erate_q)
