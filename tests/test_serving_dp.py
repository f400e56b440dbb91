"""Multi-chip BATCHED serving (data-parallel shard_map): the rollout wrapped
by gtax.parallel.mesh.data_parallel_rollout over a 4-way 'data' mesh must
equal per-slice single-device rollouts with the same folded keys — with the
FUSED Pallas kernels active (the whole point: GSPMD cannot partition a
Pallas custom call, shard_map runs the fastest single-chip path per device).

Reference has no serving parallelism (generate.py is single-GPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtax.models.dit import dit_apply, dit_init, unstack_for_inference
from gtax.nn import attention as attention_mod
from gtax.parallel import mesh as meshlib
from gtax.sampling.diffusion import SamplerConfig, make_rollout
from tests.test_models_parity import DIT_SMALL

FRAMES, STEPS, DATA = 5, 3, 4


@pytest.mark.parametrize("quantize", [False, True], ids=["bf16", "int8"])
def test_dp_serving_matches_per_slice(quantize):
    params = dit_init(jax.random.PRNGKey(0), DIT_SMALL)
    params = unstack_for_inference(params, DIT_SMALL)
    if quantize:
        from gtax.models.dit import quantize_for_inference

        params = quantize_for_inference(params, DIT_SMALL)

    def dit_fn(p, x, t, a, valid):
        return dit_apply(p, DIT_SMALL, x, t, a, valid,
                         compute_dtype=jnp.float32)

    rollout = make_rollout(dit_fn, DIT_SMALL.max_frames,
                           SamplerConfig(ddim_noise_steps=STEPS))
    B = DATA
    prompt = jax.random.normal(
        jax.random.PRNGKey(1),
        (B, 2, DIT_SMALL.in_channels, DIT_SMALL.input_h, DIT_SMALL.input_w),
    )
    actions = jax.random.uniform(
        jax.random.PRNGKey(2), (B, FRAMES, DIT_SMALL.external_cond_dim)
    )
    rng = jax.random.PRNGKey(3)

    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=DATA, model=1),
                             devices=jax.devices()[:DATA])
    attention_mod.set_backend("fused")
    try:
        dp = meshlib.data_parallel_rollout(rollout, mesh,
                                           num_gen_frames=FRAMES - 2)
        out = np.asarray(dp(params, prompt, actions, rng))

        # reference: each shard's slice with the shard's folded key
        per = B // DATA
        refs = []
        for i in range(DATA):
            key = jax.random.fold_in(rng, i)
            sl = slice(i * per, (i + 1) * per)
            refs.append(np.asarray(rollout(
                params, prompt[sl], actions[sl], key,
                num_gen_frames=FRAMES - 2)))
    finally:
        attention_mod.set_backend("xla")
    np.testing.assert_allclose(out, np.concatenate(refs), atol=1e-5,
                               rtol=1e-5)
