"""End-to-end learning check on the dummy causality probe (SURVEY.md §4):
train a small DiT on the synthetic blue->red / blue->green clips where the
last frame's colour is selected by a binary action, then verify that

  (a) training converges,
  (b) the depth-1 (reference-scheme) rollout's final frame lands near the
      latent of the action-selected colour, and
  (c) the pyramid-pipelined rollout (depth 4) makes the same choice —
      validating the fast decoding mode end to end.

Runs on whatever device JAX picks (TPU preferred). ~2-4 min.
Usage: python scripts/dummy_convergence.py [steps]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gtax.utils.platform import honor_env_platform

honor_env_platform()  # an explicit JAX_PLATFORMS=cpu must win over axon

import sys

import jax
import jax.numpy as jnp
import numpy as np

from gtax.core import schedules
from gtax.data.actions import actions_to_one_hot
from gtax.models.dit import DiTConfig, dit_apply, dit_init
from gtax.models.vae import VAEConfig, vae_init
from gtax.sampling.diffusion import (
    LossConfig, SamplerConfig, diffusion_forcing_loss, make_pipelined_rollout,
    make_rollout,
)
from gtax.train.trainer import encode_frames
from gtax.train.optim import make_optimizer
import optax

DIT = DiTConfig(input_h=6, input_w=8, patch_size=2, in_channels=4,
                hidden_size=128, depth=4, num_heads=4, mlp_ratio=4.0,
                external_cond_dim=25, max_frames=5)
VAE = VAEConfig(latent_dim=4, input_height=48, input_width=64, patch_size=8,
                enc_dim=64, enc_depth=1, enc_heads=2, dec_dim=64, dec_depth=1,
                dec_heads=2, mlp_ratio=2.0)


def make_clips():
    blue = np.array([0, 0, 1.0], np.float32)
    red = np.array([1.0, 0, 0], np.float32)
    green = np.array([0, 1.0, 0], np.float32)
    frames = [
        np.broadcast_to(((1 - t) * blue + t * red)[:, None, None],
                        (3, 48, 64))
        for t in np.linspace(0, 1, 5)
    ]
    seq_red = np.stack(frames)
    seq_green = seq_red.copy()
    seq_green[-1] = np.broadcast_to(green[:, None, None], (3, 48, 64))
    return jnp.asarray(seq_red), jnp.asarray(seq_green)


def main(steps=400):
    # GTAX_PROBE_BACKEND=fused_all (+ GTAX_INT8_FWD=1) re-runs the probe on
    # the fused trainable kernels / the int8 training forward — the
    # end-to-end loss-trajectory + causality gate for those paths
    backend = os.environ.get("GTAX_PROBE_BACKEND")
    if backend:
        from gtax.nn import attention as attention_mod

        attention_mod.set_backend(backend)
    key = jax.random.PRNGKey(0)
    dit_params = jax.jit(lambda k: dit_init(k, DIT))(key)
    vae_params = jax.jit(lambda k: vae_init(k, VAE))(jax.random.PRNGKey(1))
    seq_red, seq_green = make_clips()

    lat_red = encode_frames(vae_params, VAE, seq_red[None], jnp.float32)
    lat_green = encode_frames(vae_params, VAE, seq_green[None], jnp.float32)

    act_red = jnp.asarray(actions_to_one_hot([-1, -1, -1, -1, 0]))[None]
    act_green = jnp.asarray(actions_to_one_hot([-1, -1, -1, -1, 1]))[None]

    B = 16
    loss_cfg = LossConfig(ddim_noise_steps=16, ctx_max_noise_idx=12,
                          n_prompt_frames=4, max_frames=5)
    betas = schedules.sigmoid_beta_schedule(1000, clamp_min=1e-6)
    abar = schedules.alphas_cumprod_from_betas(betas)
    nr = schedules.ddim_noise_range(16)
    tx, _ = make_optimizer(3e-4, 3e-5, 20, steps, weight_decay=0.0)
    opt_state = tx.init(dit_params)

    def dit_fn_p(p, x, t, a, v=None):
        return dit_apply(p, DIT, x, t, a, v, compute_dtype=jnp.float32)

    @jax.jit
    def train_step(p, o, rng):
        k1, k2 = jax.random.split(rng)
        bits = jax.random.bernoulli(k1, 0.5, (B,))
        lat = jnp.where(bits[:, None, None, None, None],
                        jnp.broadcast_to(lat_green, (B, *lat_green.shape[1:])),
                        jnp.broadcast_to(lat_red, (B, *lat_red.shape[1:])))
        acts = jnp.where(bits[:, None, None],
                         jnp.broadcast_to(act_green, (B, 5, 25)),
                         jnp.broadcast_to(act_red, (B, 5, 25)))

        def loss_fn(p):
            mean_loss, s = diffusion_forcing_loss(
                lambda x, t, a, v: dit_fn_p(p, x, t, a, v), lat, acts, k2,
                loss_cfg, abar, nr,
            )
            return s, mean_loss

        (s, mean_loss), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, mean_loss

    rng = jax.random.PRNGKey(2)
    first = last = None
    for i in range(steps):
        rng, k = jax.random.split(rng)
        dit_params, opt_state, loss = train_step(dit_params, opt_state, k)
        if i == 0:
            first = float(loss)
        if i % 100 == 0:
            print(f"step {i}: loss {float(loss):.5f}")
    last = float(loss)
    print(f"loss first={first:.5f} last={last:.5f}")

    sampler = SamplerConfig(ddim_noise_steps=16, stabilization_level=63,
                            schedule_clamp_min=1e-6)
    prompt = lat_red[:, :4]

    def judge(latents, tag):
        final = latents[:, -1]
        d_red = float(jnp.mean(jnp.square(final - lat_red[:, -1])))
        d_green = float(jnp.mean(jnp.square(final - lat_green[:, -1])))
        return d_red, d_green

    results = {}
    for depth in (1, 4):
        roll = (make_rollout(dit_fn_p, 5, sampler) if depth == 1 else
                make_pipelined_rollout(dit_fn_p, 5, sampler,
                                       pipeline_depth=depth))
        for name, acts in (("red", act_red), ("green", act_green)):
            out = roll(dit_params, prompt, acts, jax.random.PRNGKey(5),
                       num_gen_frames=1)
            d_red, d_green = judge(out, name)
            pick = "red" if d_red < d_green else "green"
            results[(depth, name)] = (d_red, d_green, pick)
            print(f"depth={depth} action={name}: d_red={d_red:.4f} "
                  f"d_green={d_green:.4f} -> {pick}")

    ok = (
        last < first * 0.5
        and results[(1, "red")][2] == "red"
        and results[(1, "green")][2] == "green"
        and results[(4, "red")][2] == "red"
        and results[(4, "green")][2] == "green"
    )
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 400))
