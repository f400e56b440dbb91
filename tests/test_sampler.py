"""Sampler parity: denoise_step against recorded torch-reference outputs, and
rollout-scan equivalence against an explicit Python loop."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtax.core import schedules
from gtax.io import safetensors_port as port
from gtax.models.dit import dit_apply
from gtax.sampling import diffusion as sd
from tests.conftest import GOLDEN, assert_close
from tests.test_models_parity import DIT_SMALL


@pytest.fixture(scope="module")
def dit_small_params():
    path = os.path.join(GOLDEN, "dit_small.safetensors")
    if not os.path.exists(path):
        pytest.skip("run scripts/gen_golden.py first")
    params, _, _ = port.dit_from_torch(port.read_safetensors(path), DIT_SMALL)
    return params


@pytest.fixture(scope="module")
def dit_fn(dit_small_params):
    def fn(x, t, actions, valid=None):
        return dit_apply(
            dit_small_params, DIT_SMALL, x, t, actions, valid,
            compute_dtype=jnp.float32,
        )

    return fn


def dit_fn_p(params, x, t, actions, valid=None):
    """Params-explicit variant for make_rollout."""
    return dit_apply(
        params, DIT_SMALL, x, t, actions, valid, compute_dtype=jnp.float32
    )


@pytest.fixture(scope="module")
def tables():
    betas = schedules.sigmoid_beta_schedule(1000, clamp_min=1e-6)
    abar = schedules.alphas_cumprod_from_betas(betas)
    noise_range = schedules.ddim_noise_range(20, 1000)
    return abar, noise_range


def test_denoise_step_parity(golden, dit_fn, tables):
    g = golden("denoise_step.npz")
    abar, noise_range = tables
    np.testing.assert_array_equal(np.asarray(noise_range), g["noise_range"])
    x = jnp.asarray(g["x_noisy"])
    acts = jnp.asarray(g["actions"])
    for noise_idx in (20, 10, 1, 0):
        x_pred, v_pred = sd.denoise_step(
            dit_fn, x, acts, None, jnp.int32(noise_idx),
            stabilization_level=15, noise_range=noise_range,
            alphas_cumprod=abar,
        )
        assert_close(
            v_pred, g[f"v_pred_{noise_idx}"], atol=5e-4, rtol=1e-3,
            name=f"v_pred idx={noise_idx}",
        )
        assert_close(
            x_pred, g[f"x_pred_{noise_idx}"], atol=5e-3, rtol=1e-3,
            name=f"x_pred idx={noise_idx}",
        )


def test_denoise_step_sliding_window_parity(golden, dit_fn, tables):
    """Reference crops the window with start_frame=2 (T=3); our padded fixed
    window with the first two slots masked must agree on the cropped slots."""
    g = golden("denoise_step.npz")
    abar, noise_range = tables
    x = jnp.asarray(g["x_noisy"])
    acts = jnp.asarray(g["actions"])
    valid = jnp.asarray([False, False, True, True, True])
    # pad slots hold garbage latents; reference computed on x[:, 2:]
    x_masked = jnp.concatenate(
        [jnp.full_like(x[:, :2], 77.0), x[:, 2:]], axis=1
    )
    a_masked = jnp.concatenate([jnp.zeros_like(acts[:, :2]), acts[:, 2:]], 1)
    x_pred, v_pred = sd.denoise_step(
        dit_fn, x_masked, a_masked, valid, jnp.int32(10),
        stabilization_level=15, noise_range=noise_range, alphas_cumprod=abar,
    )
    assert_close(v_pred[:, 2:], g["v_pred_sw"], atol=5e-4, rtol=1e-3)
    assert_close(x_pred[:, 2:], g["x_pred_sw"], atol=5e-3, rtol=1e-3)


def test_rollout_matches_python_loop(dit_fn, dit_small_params):
    """The jitted nested-scan rollout must equal an explicit Python loop using
    denoise_window on hand-built windows with identical RNG usage."""
    cfg = sd.SamplerConfig(ddim_noise_steps=3, stabilization_level=15,
                           schedule_clamp_min=1e-6)
    abar, noise_range = cfg.tables()
    B, C, H, W = 1, 16, 18, 32
    n_prompt, total = 4, 7
    key0 = jax.random.PRNGKey(42)
    prompt = jax.random.normal(jax.random.PRNGKey(1), (B, n_prompt, C, H, W))
    actions = jax.random.normal(jax.random.PRNGKey(2), (B, total, 25))

    rollout = sd.make_rollout(dit_fn_p, max_frames=5, cfg=cfg)
    lat = rollout(dit_small_params, prompt, actions, key0,
                  num_gen_frames=total - n_prompt)

    # explicit loop
    ctx = prompt  # n_prompt == max_frames - 1
    frames = []
    key = key0
    for s in range(total - n_prompt):
        i = n_prompt + s
        key, sub = jax.random.split(key)
        noise = jnp.clip(
            jax.random.normal(sub, (B, 1, C, H, W), jnp.float32),
            -cfg.noise_abs_max, cfg.noise_abs_max,
        )
        window = jnp.concatenate([ctx[:, -4:], noise], axis=1)
        awin = actions[:, i - 4 : i + 1]
        valid = jnp.asarray([True] * 5)
        window, _ = sd.denoise_window(
            dit_fn, window, awin, valid, cfg, abar, noise_range
        )
        frames.append(window[:, -1])
        ctx = jnp.concatenate([ctx, window[:, -1:]], axis=1)

    manual = jnp.concatenate([prompt, jnp.stack(frames, axis=1)], axis=1)
    assert_close(lat, manual, atol=1e-4, rtol=1e-4)


def test_rollout_short_prompt(dit_small_params):
    """n_prompt=1 (custom start image path): window starts left-padded and
    must still produce finite, committed frames."""
    cfg = sd.SamplerConfig(ddim_noise_steps=2, stabilization_level=15)
    B, C, H, W = 1, 16, 18, 32
    prompt = jax.random.normal(jax.random.PRNGKey(3), (B, 1, C, H, W))
    rollout = sd.make_rollout(dit_fn_p, max_frames=5, cfg=cfg)
    lat = rollout(dit_small_params, prompt, None, jax.random.PRNGKey(0),
                  num_gen_frames=6)
    assert lat.shape == (B, 7, C, H, W)
    assert bool(jnp.all(jnp.isfinite(lat)))


def test_diffusion_forcing_loss_runs(dit_fn):
    cfg = sd.LossConfig(ddim_noise_steps=20, ctx_max_noise_idx=8,
                        n_prompt_frames=2, max_frames=5)
    betas = schedules.sigmoid_beta_schedule(1000, clamp_min=1e-6)
    abar = schedules.alphas_cumprod_from_betas(betas)
    nr = schedules.ddim_noise_range(20)
    latents = jax.random.normal(jax.random.PRNGKey(5), (2, 5, 16, 18, 32))
    actions = jax.random.normal(jax.random.PRNGKey(6), (2, 5, 25))
    mean_loss, sum_loss = sd.diffusion_forcing_loss(
        dit_fn, latents, actions, jax.random.PRNGKey(7), cfg, abar, nr
    )
    assert np.isfinite(float(mean_loss))
    # 3 generated frames: mean * 3 == sum
    assert_close(sum_loss, mean_loss * 3.0, atol=1e-5)


def test_attention_broadcast_rollout(dit_small_params):
    """Attention broadcast (SamplerConfig.attn_broadcast): K=1 with pab fns
    is bit-identical to the exact scheme; K>1 runs, stays finite, and
    actually diverges (proving attention really is skipped) while staying
    close to the exact rollout. The golden torch checkpoint has non-trivial
    adaLN gates, so cached deltas are non-zero."""
    import dataclasses

    from gtax.models.dit import make_pab_fns

    prompt = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 4, 16, 18, 32)) * 0.1,
        jnp.float32,
    )
    acts = jnp.zeros((1, 10, 25), jnp.float32)
    sam = sd.SamplerConfig(ddim_noise_steps=6, stabilization_level=15)
    exact = sd.make_rollout(dit_fn_p, 5, sam)(
        dit_small_params, prompt, acts, jax.random.PRNGKey(3),
        num_gen_frames=4,
    )
    pab = make_pab_fns(DIT_SMALL, jnp.float32)
    k1 = sd.make_rollout(
        dit_fn_p, 5, dataclasses.replace(sam, attn_broadcast=1), pab=pab
    )(dit_small_params, prompt, acts, jax.random.PRNGKey(3),
      num_gen_frames=4)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(exact))

    k2 = sd.make_rollout(
        dit_fn_p, 5, dataclasses.replace(sam, attn_broadcast=2), pab=pab
    )(dit_small_params, prompt, acts, jax.random.PRNGKey(3),
      num_gen_frames=4)
    diff = float(jnp.abs(k2 - exact).max())
    scale = float(jnp.abs(exact).max())
    assert np.isfinite(np.asarray(k2)).all()
    assert diff > 0.0, "broadcast produced identical output — cache unused?"
    assert diff < 0.25 * scale, f"broadcast drift too large: {diff} vs {scale}"


def test_cond_cache_rollout_exact(dit_small_params):
    """The conditioning cache (make_cond_fns / make_rollout(cond=...)) is
    bit-exact vs the plain rollout on the same unstacked params: identical
    adaln/linear math, just batched per-trajectory instead of per-step."""
    from gtax.models.dit import make_cond_fns, unstack_for_inference

    unstacked = unstack_for_inference(dit_small_params, DIT_SMALL)
    prompt = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 2, 16, 18, 32)) * 0.1,
        jnp.float32,
    )  # short prompt: exercises the padded/masked-window path too
    acts = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 8, 25)), jnp.float32
    )
    sam = sd.SamplerConfig(ddim_noise_steps=5, stabilization_level=15)
    plain = sd.make_rollout(dit_fn_p, 5, sam)(
        unstacked, prompt, acts, jax.random.PRNGKey(7), num_gen_frames=4
    )
    cond = make_cond_fns(DIT_SMALL, jnp.float32)
    cached = sd.make_rollout(dit_fn_p, 5, sam, cond=cond)(
        unstacked, prompt, acts, jax.random.PRNGKey(7), num_gen_frames=4
    )
    np.testing.assert_allclose(
        np.asarray(cached), np.asarray(plain), atol=1e-5, rtol=1e-5
    )
    # no-actions model path
    plain_na = sd.make_rollout(dit_fn_p, 5, sam)(
        unstacked, prompt, None, jax.random.PRNGKey(7), num_gen_frames=4
    )
    cached_na = sd.make_rollout(dit_fn_p, 5, sam, cond=cond)(
        unstacked, prompt, None, jax.random.PRNGKey(7), num_gen_frames=4
    )
    np.testing.assert_allclose(
        np.asarray(cached_na), np.asarray(plain_na), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("batch", [1, 2])
def test_incremental_rollout_matches_fused(dit_small_params, batch):
    """Incremental decoding vs the full-window fused-backend rollout on the
    golden small checkpoint (fp32, interpret-mode kernels): the context
    prefill + last-frame steps must reproduce the exact scheme. Covers the
    short-prompt (masked padded slots) case and batched serving (B=2,
    exercising the step kernels' n_batches path)."""
    from gtax.models.dit import (make_cond_fns, make_incremental_fns,
                                 unstack_for_inference)
    from gtax.nn import attention as nnattn

    unstacked = unstack_for_inference(dit_small_params, DIT_SMALL)
    prompt = jnp.asarray(
        np.random.default_rng(3).normal(size=(batch, 2, 16, 18, 32)) * 0.1,
        jnp.float32,
    )
    acts = jnp.asarray(
        np.random.default_rng(4).normal(size=(batch, 8, 25)), jnp.float32
    )
    sam = sd.SamplerConfig(ddim_noise_steps=4, stabilization_level=15)
    cond = make_cond_fns(DIT_SMALL, jnp.float32)
    nnattn.set_backend("fused")
    try:
        plain = sd.make_rollout(dit_fn_p, 5, sam, cond=cond)(
            unstacked, prompt, acts, jax.random.PRNGKey(9), num_gen_frames=4
        )
        inc = make_incremental_fns(DIT_SMALL, jnp.float32)
        fast = sd.make_rollout(dit_fn_p, 5, sam, cond=cond, incremental=inc)(
            unstacked, prompt, acts, jax.random.PRNGKey(9), num_gen_frames=4
        )
    finally:
        nnattn.set_backend("xla")
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(plain), atol=2e-4, rtol=1e-4
    )
