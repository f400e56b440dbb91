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
    # generated frames have sane magnitude (were actually denoised, not
    # left as clipped unit noise)
    gen = np.asarray(out[:, 4:])
    assert gen.std() > 0


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
