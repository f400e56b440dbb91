"""Quality/speed validation of pyramid-pipelined decoding vs the reference
scheme (VERDICT r1 next-#7).

Trains the small action-conditioned DiT on the dummy causality probe (the
reference's de-facto integration test, dummy_dataset.py), then rolls out a
12-frame video at pipeline depths 1/2/4 and reports, per depth:
  - model calls per generated frame (the speed lever),
  - the action-causality probe result (does the final frame follow the
    action bit),
  - per-frame PSNR of the decoded video against the depth-1 (reference-
    scheme) rollout,
  - per-frame latent RMSE against the ground-truth clip latents.

The shipped real checkpoints are unreachable from this offline environment
(BASELINE.md); the dummy-TRAINED model is the strongest quality probe
available — it has an unambiguous correct output per action, so divergence
is measurable. Full-size behaviour is additionally sanity-checked by
scripts/parity_rollout_gate.py (depth 1) and bench.py (fps per depth).

Usage: python scripts/pipelined_quality.py [train_steps]
Writes: docs/pipelined_quality.json
"""

from __future__ import annotations

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
from gtax.models.dit import dit_apply, dit_init
from gtax.sampling.diffusion import (
    LossConfig, SamplerConfig, diffusion_forcing_loss, make_pipelined_rollout,
    make_rollout,
)
from gtax.models.vae import vae_init
from gtax.train.trainer import decode_frames, encode_frames
from gtax.train.optim import make_optimizer
from gtax.utils.metrics import per_frame_psnr
from scripts.dummy_convergence import DIT, VAE, make_clips  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(steps=400, total_frames=12):
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
    for i in range(steps):
        rng, k = jax.random.split(rng)
        dit_params, opt_state, loss = train_step(dit_params, opt_state, k)
        if i % 100 == 0:
            print(f"train step {i}: loss {float(loss):.5f}", flush=True)

    sampler = SamplerConfig(ddim_noise_steps=16, stabilization_level=63,
                            schedule_clamp_min=1e-6)
    prompt = lat_red[:, :4]
    n_gen = total_frames - 4
    # the probe action sequence: keep pressing the "green" action for every
    # generated frame so all generated frames should be green
    acts_long = jnp.concatenate(
        [act_red[:, :4],
         jnp.broadcast_to(act_green[:, -1:], (1, n_gen, 25))], axis=1
    )

    steps_cfg = sampler.ddim_noise_steps
    videos, latents = {}, {}
    report = {}
    for depth in (1, 2, 4):
        roll = (make_rollout(dit_fn_p, 5, sampler) if depth == 1 else
                make_pipelined_rollout(dit_fn_p, 5, sampler,
                                       pipeline_depth=depth))
        lat = roll(dit_params, prompt, acts_long, jax.random.PRNGKey(5),
                   num_gen_frames=n_gen)
        vid = np.asarray(decode_frames(vae_params, VAE, lat, jnp.float32))[0]
        videos[depth] = vid
        latents[depth] = np.asarray(lat)
        # causality: every generated frame should be nearer the green latent
        gen = lat[0, 4:]
        d_green = np.mean(np.square(np.asarray(gen) -
                                    np.asarray(lat_green[0, -1])), (1, 2, 3))
        d_red = np.mean(np.square(np.asarray(gen) -
                                  np.asarray(lat_red[0, -1])), (1, 2, 3))
        calls_per_frame = (steps_cfg + 1) if depth == 1 else -(-(
            steps_cfg + 1) // depth)
        report[str(depth)] = {
            "model_calls_per_frame": calls_per_frame,
            "probe_green_frames": int(np.sum(d_green < d_red)),
            "gen_frames": int(n_gen),
            "latent_rmse_vs_truth": round(float(np.sqrt(np.mean(
                np.square(np.asarray(gen) - np.asarray(lat_green[0, -1]))
            ))), 4),
        }

    for depth in (2, 4):
        scores = per_frame_psnr(videos[depth][4:], videos[1][4:])
        report[str(depth)]["psnr_vs_depth1_min"] = round(min(scores), 2)
        report[str(depth)]["psnr_vs_depth1_mean"] = round(
            float(np.mean(scores)), 2)

    out = os.path.join(REPO, "docs", "pipelined_quality.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    ok = all(r["probe_green_frames"] == r["gen_frames"]
             for r in report.values())
    print("PASS" if ok else "FAIL (some generated frames ignored the action)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 400))
