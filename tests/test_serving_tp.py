"""Multi-chip tensor-parallel SERVING: the jitted rollout partitioned by
GSPMD over a 1xN 'model' mesh must reproduce the single-device rollout.

The reference has no serving parallelism at all (generate.py is strictly
single-GPU); this is a gtax capability: `--mesh_model N` shards every DiT
block GEMM over the mesh (gtax/parallel/mesh.py::_dit_param_spec) and XLA
inserts the ICI collectives. Covers both the stacked (L, in, out) layout
and the unstacked serving layout (per-block (in, out) kernels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from gtax.models.dit import dit_apply, dit_init, unstack_for_inference
from gtax.nn import attention as attention_mod
from gtax.parallel import mesh as meshlib
from gtax.sampling.diffusion import SamplerConfig, make_rollout
from tests.conftest import assert_close
from tests.test_models_parity import DIT_SMALL

FRAMES, STEPS = 6, 4


@pytest.fixture(scope="module", autouse=True)
def xla_backend():
    prev = attention_mod.get_backend()
    attention_mod.set_backend("xla")
    yield
    attention_mod.set_backend(prev)


@pytest.fixture(scope="module")
def setup():
    params = dit_init(jax.random.PRNGKey(0), DIT_SMALL)

    def dit_fn(p, x, t, a, valid):
        return dit_apply(p, DIT_SMALL, x, t, a, valid,
                         compute_dtype=jnp.float32)

    rollout = make_rollout(dit_fn, DIT_SMALL.max_frames,
                           SamplerConfig(ddim_noise_steps=STEPS))
    prompt = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, 2, DIT_SMALL.in_channels, DIT_SMALL.input_h, DIT_SMALL.input_w),
    )
    actions = jax.random.uniform(
        jax.random.PRNGKey(2), (1, FRAMES, DIT_SMALL.external_cond_dim)
    )
    ref = rollout(params, prompt, actions, jax.random.PRNGKey(3),
                  num_gen_frames=FRAMES - 2)
    return params, rollout, prompt, actions, np.asarray(ref)


@pytest.mark.parametrize("unstack", [False, True],
                         ids=["stacked", "unstacked"])
def test_tp_serving_matches_single_device(setup, unstack):
    params, rollout, prompt, actions, ref = setup
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=1, model=4),
                             devices=jax.devices()[:4])
    p = unstack_for_inference(params, DIT_SMALL) if unstack else params
    shardings = meshlib.param_sharding(mesh, p)
    # the rules must actually shard the block interiors — a fully
    # replicated tree would make this test vacuous
    specs = jax.tree.leaves(
        jax.tree.map(lambda s: s.spec, shardings,
                     is_leaf=lambda x: hasattr(x, "spec"))
    )
    assert any("model" in (spec or ()) for spec in specs), specs
    p = jax.device_put(p, shardings)
    prompt_r = jax.device_put(prompt, meshlib.replicated(mesh))
    actions_r = jax.device_put(actions, meshlib.replicated(mesh))

    out = rollout(p, prompt_r, actions_r, jax.random.PRNGKey(3),
                  num_gen_frames=FRAMES - 2)
    assert_close(out, ref, atol=2e-4, rtol=2e-4, name="tp rollout")


def test_tp_sharding_rules_divide_flagship():
    """Every sharded dimension of the FLAGSHIP DiT-S/2 divides by 8 (a v5e-8
    slice) for both layouts — the config-change-not-rewrite promise."""
    from gtax.models.dit import DiT_MODELS

    cfg = DiT_MODELS["DiT-S/2"]()
    shapes = jax.eval_shape(lambda k: dit_init(k, cfg),
                            jax.random.PRNGKey(0))

    def check(path, leaf):
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        spec = meshlib._dit_param_spec(keys, leaf.ndim)
        for dim, axis in enumerate(spec):
            if axis == "model":
                assert leaf.shape[dim] % 8 == 0, (keys, leaf.shape, dim)

    jax.tree_util.tree_map_with_path(check, shapes)
