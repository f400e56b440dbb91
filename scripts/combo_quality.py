"""Quality probe for COMBINED pyramid-pipelined decoding + attention
broadcast (pipeline_depth > 1 AND attn_broadcast K > 1).

Within a pipelined cycle the window's frame identities are fixed for the
cycle's `stride` inner DiT calls, so the broadcast cache stays aligned; the
cache resets every cycle and the first/last inner calls always recompute
(gtax/sampling/diffusion.py::make_pipelined_rollout, pab=...).

Method mirrors scripts/pipelined_quality.py and broadcast_quality.py: train
the small action-conditioned DiT on the dummy causality probe (the
reference's de-facto integration test, dummy_dataset.py), then compare the
combined-mode rollout against the exact reference-scheme rollout on:
  - the action-causality probe (does each generated frame follow the
    action bit), and
  - per-frame PSNR of the decoded video vs the exact rollout.

Usage: python scripts/combo_quality.py [train_steps]
Writes: docs/combo_quality.json
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gtax.utils.platform import honor_env_platform

honor_env_platform()  # an explicit JAX_PLATFORMS=cpu must win over axon

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gtax.core import schedules
from gtax.data.actions import actions_to_one_hot
from gtax.models.dit import dit_apply, dit_init, make_pab_fns
from gtax.models.vae import vae_init
from gtax.sampling.diffusion import (
    LossConfig,
    SamplerConfig,
    diffusion_forcing_loss,
    make_pipelined_rollout,
    make_rollout,
)
from gtax.train.optim import make_optimizer
from gtax.train.trainer import decode_frames, encode_frames
from gtax.utils.metrics import per_frame_psnr
from scripts.dummy_convergence import DIT, VAE, make_clips


def main(train_steps: int = 1200) -> dict:
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
    tx, _ = make_optimizer(3e-4, 3e-5, 20, train_steps, weight_decay=0.0)
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
                loss_cfg, abar, nr)
            return s, mean_loss

        (s, mean_loss), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, mean_loss

    rng = jax.random.PRNGKey(2)
    for _ in range(train_steps):
        rng, k = jax.random.split(rng)
        dit_params, opt_state, loss = train_step(dit_params, opt_state, k)
    print(f"final train loss: {float(loss):.4f}")

    base = SamplerConfig(ddim_noise_steps=16, stabilization_level=63,
                         schedule_clamp_min=1e-6)
    prompt = lat_red[:, :4]
    n_gen = 8
    acts_long = jnp.concatenate(
        [act_red[:, :4], jnp.broadcast_to(act_green[:, -1:], (1, n_gen, 25))],
        axis=1)
    pab = make_pab_fns(DIT, jnp.float32)

    exact = make_rollout(dit_fn_p, 5, base)(
        dit_params, prompt, acts_long, jax.random.PRNGKey(5),
        num_gen_frames=n_gen)
    vid_exact = np.asarray(
        decode_frames(vae_params, VAE, exact, jnp.float32))[0]

    report = {}
    for depth, K in [(4, 2), (2, 2)]:
        sam = dataclasses.replace(base, attn_broadcast=K)
        lat = make_pipelined_rollout(
            dit_fn_p, 5, sam, pipeline_depth=depth, pab=pab)(
            dit_params, prompt, acts_long, jax.random.PRNGKey(5),
            num_gen_frames=n_gen)
        vid = np.asarray(decode_frames(vae_params, VAE, lat, jnp.float32))[0]
        gen = np.asarray(lat[0, 4:])
        dg = np.mean(np.square(gen - np.asarray(lat_green[0, -1])), (1, 2, 3))
        dr = np.mean(np.square(gen - np.asarray(lat_red[0, -1])), (1, 2, 3))
        scores = per_frame_psnr(vid[4:], vid_exact[4:])
        report[f"depth{depth}_K{K}"] = {
            "probe": f"{int(np.sum(dg < dr))}/{n_gen}",
            "psnr_vs_exact_min": round(min(scores), 2),
            "psnr_vs_exact_mean": round(float(np.mean(scores)), 2),
        }
    return report


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    report = main(steps)
    print(json.dumps(report, indent=1))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "combo_quality.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(f"wrote {out}")
