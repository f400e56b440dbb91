"""Pipelined (pyramid) rollout tests: depth-1 equivalence with the reference
scheme, and mechanics of deeper pipelines."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtax.sampling import diffusion as sd
from tests.conftest import assert_close
from tests.test_sampler import dit_fn_p, dit_small_params  # noqa: F401


def test_depth1_equals_reference_rollout(dit_small_params):
    """pipeline_depth=1 is exactly the reference scheme — same windows, same
    noise draws, same DDIM trajectory — so outputs must match make_rollout."""
    cfg = sd.SamplerConfig(ddim_noise_steps=4, stabilization_level=15,
                           schedule_clamp_min=1e-6)
    B, C, H, W = 1, 16, 18, 32
    prompt = jax.random.normal(jax.random.PRNGKey(1), (B, 4, C, H, W))
    actions = jax.random.normal(jax.random.PRNGKey(2), (B, 10, 25))
    key = jax.random.PRNGKey(7)

    ref = sd.make_rollout(dit_fn_p, 5, cfg)(
        dit_small_params, prompt, actions, key, num_gen_frames=6
    )
    pipe = sd.make_pipelined_rollout(dit_fn_p, 5, cfg, pipeline_depth=1)(
        dit_small_params, prompt, actions, key, num_gen_frames=6
    )
    assert_close(pipe, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("depth", [2, 4])
def test_deeper_pipeline_mechanics(dit_small_params, depth):
    cfg = sd.SamplerConfig(ddim_noise_steps=6, stabilization_level=15)
    B, C, H, W = 1, 16, 18, 32
    prompt = jax.random.normal(jax.random.PRNGKey(3), (B, 4, C, H, W))
    actions = jax.random.normal(jax.random.PRNGKey(4), (B, 12, 25))
    out = sd.make_pipelined_rollout(dit_fn_p, 5, cfg, pipeline_depth=depth)(
        dit_small_params, prompt, actions, jax.random.PRNGKey(0),
        num_gen_frames=8,
    )
    assert out.shape == (B, 12, C, H, W)
    assert bool(jnp.all(jnp.isfinite(out)))
    # prompt frames pass through untouched
    np.testing.assert_array_equal(np.asarray(out[:, :4]), np.asarray(prompt))
    # generated frames actually went through the model: the output must
    # depend on the params (raw clipped noise would not)
    gen = np.asarray(out[:, 4:])
    out2 = sd.make_pipelined_rollout(dit_fn_p, 5, cfg, pipeline_depth=depth)(
        jax.tree.map(lambda p: p * 1.5, dit_small_params), prompt, actions,
        jax.random.PRNGKey(0), num_gen_frames=8,
    )
    assert not np.allclose(gen, np.asarray(out2[:, 4:]))


@pytest.mark.slow
def test_pipeline_call_count(dit_small_params):
    """Depth-P rollouts make ~P-fold fewer DiT calls per frame."""
    calls = {"n": 0}

    def counting_dit(params, x, t, a, v):
        calls["n"] += 1
        return dit_fn_p(params, x, t, a, v)

    cfg = sd.SamplerConfig(ddim_noise_steps=8, stabilization_level=15)
    prompt = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 16, 18, 32))
    with jax.disable_jit():
        sd.make_pipelined_rollout(counting_dit, 5, cfg, pipeline_depth=1)(
            dit_small_params, prompt, None, jax.random.PRNGKey(0),
            num_gen_frames=4,
        )
        depth1 = calls["n"]
        calls["n"] = 0
        sd.make_pipelined_rollout(counting_dit, 5, cfg, pipeline_depth=4)(
            dit_small_params, prompt, None, jax.random.PRNGKey(0),
            num_gen_frames=4,
        )
        depth4 = calls["n"]
    # depth1: 4 cycles x 9 calls = 36; depth4: 7 cycles x ceil(9/4)=3 -> 21
    assert depth1 == 4 * 9, depth1
    assert depth4 == (4 + 3) * 3, depth4


def test_pipelined_with_broadcast(dit_small_params):
    """Combined pipelining + attention broadcast. With stride=2 (steps=3,
    depth=2) every inner call recomputes (k=0 hits k%K==0, k=1 is the last
    call), so the pab path must be bit-identical to the plain pipelined
    rollout; with a longer stride real reuse happens and the output must
    stay finite and prompt-preserving."""
    import dataclasses

    from gtax.models.dit import make_pab_fns
    from tests.test_models_parity import DIT_SMALL

    B, C, H, W = 1, 16, 18, 32
    prompt = jax.random.normal(jax.random.PRNGKey(3), (B, 4, C, H, W))
    actions = jax.random.normal(jax.random.PRNGKey(4), (B, 12, 25))
    pab = make_pab_fns(DIT_SMALL, jnp.float32)

    # steps=3, depth=2 -> stride = ceil(4/2) = 2: all inner calls recompute
    cfg = sd.SamplerConfig(ddim_noise_steps=3, stabilization_level=15,
                           attn_broadcast=2)
    plain = sd.make_pipelined_rollout(
        dit_fn_p, 5, dataclasses.replace(cfg, attn_broadcast=1),
        pipeline_depth=2,
    )(dit_small_params, prompt, actions, jax.random.PRNGKey(0),
      num_gen_frames=8)
    combo = sd.make_pipelined_rollout(dit_fn_p, 5, cfg, pipeline_depth=2,
                                      pab=pab)(
        dit_small_params, prompt, actions, jax.random.PRNGKey(0),
        num_gen_frames=8)
    assert_close(combo, plain, atol=1e-5, rtol=1e-5)

    # steps=8, depth=2 -> stride 5: k=1,3 reuse the cache for real
    cfg2 = sd.SamplerConfig(ddim_noise_steps=8, stabilization_level=15,
                            attn_broadcast=2)
    out = sd.make_pipelined_rollout(dit_fn_p, 5, cfg2, pipeline_depth=2,
                                    pab=pab)(
        dit_small_params, prompt, actions, jax.random.PRNGKey(0),
        num_gen_frames=8)
    assert out.shape == (B, 12, C, H, W)
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_array_equal(np.asarray(out[:, :4]), np.asarray(prompt))


def test_warmup_context_alignment():
    """During warm-up cycles the context slot must hold the prompt frame at
    its nominal window position (slot j = frame base+j), not the newest
    prompt frame — otherwise early generated frames attend to a context
    latent at the wrong temporal-RoPE distance with the wrong action row."""
    records = []

    def probe_dit(params, x, t, a, valid):
        jax.debug.callback(
            lambda x, t, v: records.append(
                (np.asarray(x), np.asarray(t), np.asarray(v))),
            x, t, valid, ordered=True)
        return jnp.zeros_like(x)

    cfg = sd.SamplerConfig(ddim_noise_steps=3, stabilization_level=15)
    B, C, H, W = 1, 2, 2, 2
    n_prompt, P, frames_win = 2, 2, 3  # n_ctx_slots = 1, stride = 2
    # prompt frame f is constant (f + 1)
    prompt = jnp.stack(
        [jnp.full((C, H, W), f + 1.0) for f in range(n_prompt)])[None]
    roll = sd.make_pipelined_rollout(probe_dit, frames_win, cfg,
                                     pipeline_depth=P)
    roll(None, prompt, None, jax.random.PRNGKey(0), num_gen_frames=3)
    jax.effects_barrier()
    stride = 2  # ceil((3+1)/2)
    # cycle 0 (warm-up): base = n_prompt + 0 - (P-1) - 1 = 0 -> ctx slot
    # holds frame 0 (value 1.0), NOT the newest prompt frame (2.0)
    win0 = records[0][0]
    np.testing.assert_allclose(win0[0, 0], np.full((C, H, W), 1.0))
    assert records[0][2][0]  # ctx slot valid (frame 0 exists)
    # cycle 1 (first emit cycle): carried ctx = newest prompt frame (2.0)
    win1 = records[stride][0]
    np.testing.assert_allclose(win1[0, 0], np.full((C, H, W), 2.0))


def test_overshoot_slots_idle_at_pure_noise():
    """Slots whose raw noise index overshoots the schedule top must leave
    their latent untouched (idle at pure noise) rather than re-applying the
    first DDIM step at a mismatched level."""
    records = []

    def probe_dit(params, x, t, a, valid):
        jax.debug.callback(
            lambda x: records.append(np.asarray(x)), x, ordered=True)
        return jnp.zeros_like(x)

    # steps=2, P=2 -> stride=2, newest slot's first raw index = 3 > steps
    cfg = sd.SamplerConfig(ddim_noise_steps=2, stabilization_level=15)
    B, C, H, W = 1, 2, 2, 2
    prompt = jnp.ones((B, 2, C, H, W))
    roll = sd.make_pipelined_rollout(probe_dit, 3, cfg, pipeline_depth=2)
    roll(None, prompt, None, jax.random.PRNGKey(0), num_gen_frames=2)
    jax.effects_barrier()
    # within each cycle the newest in-flight slot (window slot 2) overshoots
    # (raw = stride+1 = 3 > steps) in the first call, so the second call
    # must see it UNCHANGED; cycle 1's records are at indices 2, 3
    np.testing.assert_array_equal(records[0][0, 2], records[1][0, 2])
    np.testing.assert_array_equal(records[2][0, 2], records[3][0, 2])
    # while cycle 1's OLDER in-flight slot (raw=1 -> started, holding cycle
    # 0's denoised noise) does change between the two calls
    assert not np.array_equal(records[2][0, 1], records[3][0, 1])


@pytest.mark.parametrize("depth,batch", [(1, 1), (2, 2), (4, 1)])
def test_pipelined_incremental_matches_full(dit_small_params, depth, batch):
    """cond+incremental pipelined rollout (per-cycle context prefill +
    P-live-frame steps, dit_apply_step Tl=P) reproduces the plain pipelined
    trajectory — the composition of the two biggest serving levers
    (VERDICT r2 next-#4). Depth 1 additionally must match the exact
    incremental make_rollout path (same scheme)."""
    from gtax.models.dit import (make_cond_fns, make_incremental_fns,
                                 unstack_for_inference)
    from gtax.nn import attention as nnattn
    from tests.test_models_parity import DIT_SMALL

    unstacked = unstack_for_inference(dit_small_params, DIT_SMALL)
    cfg = sd.SamplerConfig(ddim_noise_steps=4, stabilization_level=15)
    B, C, H, W = batch, 16, 18, 32
    prompt = jax.random.normal(jax.random.PRNGKey(1), (B, 4, C, H, W)) * 0.1
    actions = jax.random.normal(jax.random.PRNGKey(2), (B, 12, 25))
    key = jax.random.PRNGKey(7)
    cond = make_cond_fns(DIT_SMALL, jnp.float32)
    inc = make_incremental_fns(DIT_SMALL, jnp.float32)
    nnattn.set_backend("fused")
    try:
        plain = sd.make_pipelined_rollout(
            dit_fn_p, 5, cfg, pipeline_depth=depth)(
            unstacked, prompt, actions, key, num_gen_frames=6)
        fast = sd.make_pipelined_rollout(
            dit_fn_p, 5, cfg, pipeline_depth=depth, cond=cond,
            incremental=inc)(
            unstacked, prompt, actions, key, num_gen_frames=6)
        if depth == 1:
            exact = sd.make_rollout(dit_fn_p, 5, cfg, cond=cond,
                                    incremental=inc)(
                unstacked, prompt, actions, key, num_gen_frames=6)
            np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                                       atol=2e-4, rtol=1e-4)
    finally:
        nnattn.set_backend("xla")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(plain),
                               atol=2e-4, rtol=1e-4)
