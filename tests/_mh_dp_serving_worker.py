"""Worker for the 2-process data-parallel SERVING test (tests/test_multihost.py).

Usage: python tests/_mh_dp_serving_worker.py <process_id> <num_processes> <port>

Each worker owns 2 virtual CPU devices (4 global), joins a jax.distributed
cluster, and runs data_parallel_rollout over the global 4-way 'data' mesh
with a host-identical global batch. Each process contributes only its local
rows (make_array_from_process_local_data); the worker then checks every
LOCALLY-addressable output shard against a single-device rollout of the
same slice with the shard's folded key — proving the multi-host serving
data plumbing moves the right rows to the right devices.
"""

import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["GTAX_COORDINATOR"] = f"localhost:{port}"
    os.environ["GTAX_NUM_PROCESSES"] = str(nproc)
    os.environ["GTAX_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from gtax.models.dit import (DiTConfig, dit_apply, dit_init,
                                 unstack_for_inference)
    from gtax.parallel import mesh as meshlib
    from gtax.sampling.diffusion import SamplerConfig, make_rollout

    meshlib.initialize_distributed()  # env-driven mode
    assert jax.process_count() == nproc
    data = jax.device_count()
    assert data == 2 * nproc

    cfg = DiTConfig(hidden_size=64, depth=1, num_heads=2)
    params = dit_init(jax.random.PRNGKey(0), cfg)  # host-identical
    params = unstack_for_inference(params, cfg)

    def dit_fn(p, x, t, a, valid):
        return dit_apply(p, cfg, x, t, a, valid, compute_dtype=jnp.float32)

    rollout = make_rollout(dit_fn, cfg.max_frames,
                           SamplerConfig(ddim_noise_steps=2))
    B, n_prompt, n_gen = data, 2, 2
    prompt = jax.random.normal(
        jax.random.PRNGKey(1),
        (B, n_prompt, cfg.in_channels, cfg.input_h, cfg.input_w))
    actions = jax.random.uniform(
        jax.random.PRNGKey(2), (B, n_prompt + n_gen, cfg.external_cond_dim))
    rng = jax.random.PRNGKey(3)

    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=data, model=1))
    dp = meshlib.data_parallel_rollout(rollout, mesh, num_gen_frames=n_gen)
    out = dp(params, prompt, actions, rng)

    per = B // data
    checked = 0
    for shard in out.addressable_shards:
        i = shard.index[0].start // per
        sl = slice(i * per, (i + 1) * per)
        exp = rollout(params, prompt[sl], actions[sl],
                      jax.random.fold_in(rng, i), num_gen_frames=n_gen)
        np.testing.assert_allclose(np.asarray(shard.data), np.asarray(exp),
                                   atol=1e-5, rtol=1e-5)
        checked += 1
    assert checked == 2, checked

    # and the high-level API end to end: each host gets back its OWN rows
    # (decode stays local; no cross-host pixel gather)
    from gtax.serving import ServingConfig, VideoGenerator

    gen = VideoGenerator.load("", "", ServingConfig(
        dtype="float32", attention_backend="xla", unstack=False,
        noise_steps=2, mesh_data=data,
        dit_model="DiT-debug", vae_model="vae-debug"))
    h, w = gen.vae_cfg.input_height, gen.vae_cfg.input_width
    prompt_px = np.random.default_rng(0).random((data, 2, 3, h, w),
                                                np.float32)
    px = gen.generate(prompt_px, num_frames=4, seed=0)
    assert px.shape == (data // nproc, 4, h, w, 3), px.shape
    assert px.dtype == np.uint8

    print(f"RANK {pid} DP-SERVING OK {checked}", flush=True)


if __name__ == "__main__":
    main()
