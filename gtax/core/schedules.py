"""Diffusion beta schedules.

Behavioural parity targets (reference /root/reference/utils.py):
  - sigmoid_beta_schedule          utils.py:30-48   (the one used everywhere)
  - sigmoid_beta_schedule_clamped  utils.py:13-28
  - sigmoid_beta_schedule_og       utils.py:51-64
  - cosine_beta_schedule           utils.py:66-84   (power-8 variant)
  - linear_beta_schedule           utils.py:86-102

All schedule math is done in float64 on host (numpy), exactly as the torch
reference computes in float64 tensors, then materialised as float32 jnp
arrays. Schedules are tiny (<= MAX_NOISE_LEVEL entries) and computed once at
setup time, so there is no reason to trace them.

Note the reference's dual convention: training constructs the schedule with
clamp_min=1e-6 (train_dit.py:292) while the generate CLI uses the default
clamp_min=1e-4 (generate.py:195). Both are supported via the argument.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-np.asarray(x, dtype=np.float64)))


def sigmoid_beta_schedule(
    timesteps: int,
    start: float = -3.0,
    end: float = 3.0,
    tau: float = 1.0,
    clamp_min: float = 1e-4,
) -> jnp.ndarray:
    """Sigmoid alpha-bar schedule rescaled into [clamp_min, 1].

    Proposed in https://arxiv.org/abs/2212.11972 (fig. 8). Mirrors reference
    utils.py:30-48: alphas_cumprod is scaled (not clamped) into
    [clamp_min, 1], betas derived as 1 - abar[1:]/abar[:-1], clipped to
    [0, 0.999]. Returns float32 betas of shape (timesteps,).
    """
    steps = timesteps + 1
    t = np.linspace(0.0, float(timesteps), steps, dtype=np.float64) / timesteps
    v_start = _sigmoid(start / tau)
    v_end = _sigmoid(end / tau)
    abar = (-_sigmoid((t * (end - start) + start) / tau) + v_end) / (v_end - v_start)
    abar = abar / abar[0]
    abar = abar * (1.0 - clamp_min) + clamp_min
    betas = 1.0 - (abar[1:] / abar[:-1])
    return jnp.asarray(np.clip(betas, 0.0, 0.999), dtype=jnp.float32)


def sigmoid_beta_schedule_clamped(
    timesteps: int,
    start: float = -3.0,
    end: float = 3.0,
    tau: float = 1.0,
    clamp_min: float = 1e-4,
) -> jnp.ndarray:
    """Variant that clamps alphas_cumprod instead of rescaling
    (reference utils.py:13-28)."""
    steps = timesteps + 1
    t = np.linspace(0.0, float(timesteps), steps, dtype=np.float64) / timesteps
    v_start = _sigmoid(start / tau)
    v_end = _sigmoid(end / tau)
    abar = (-_sigmoid((t * (end - start) + start) / tau) + v_end) / (v_end - v_start)
    abar = abar / abar[0]
    abar = np.clip(abar, clamp_min, None)
    betas = 1.0 - (abar[1:] / abar[:-1])
    return jnp.asarray(np.clip(betas, 0.0, 0.999), dtype=jnp.float32)


def sigmoid_beta_schedule_og(
    timesteps: int, start: float = -3.0, end: float = 3.0, tau: float = 1.0
) -> jnp.ndarray:
    """Original (unclamped) sigmoid schedule (reference utils.py:51-64)."""
    steps = timesteps + 1
    t = np.linspace(0.0, float(timesteps), steps, dtype=np.float64) / timesteps
    v_start = _sigmoid(start / tau)
    v_end = _sigmoid(end / tau)
    abar = (-_sigmoid((t * (end - start) + start) / tau) + v_end) / (v_end - v_start)
    abar = abar / abar[0]
    betas = 1.0 - (abar[1:] / abar[:-1])
    return jnp.asarray(np.clip(betas, 0.0, 0.999), dtype=jnp.float32)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> jnp.ndarray:
    """Modified power-8 cosine schedule (reference utils.py:66-84).

    The reference computes this one in float32 (torch.linspace default);
    float64 here is a superset of that precision and the test tolerance
    absorbs the difference.
    """
    steps = timesteps + 1
    x = np.linspace(0.0, float(timesteps), steps, dtype=np.float64)
    abar = np.cos(((x / timesteps) + s) / (1 + s) * np.pi * 0.5) ** 8
    abar = abar / abar[0]
    min_value = 0.001
    abar = abar * (1.0 - min_value) + min_value
    betas = 1.0 - (abar[1:] / abar[:-1])
    return jnp.asarray(np.clip(betas, 0.0, 0.999), dtype=jnp.float32)


def linear_beta_schedule(
    timesteps: int, beta_start: float = 1e-4, beta_end: float = 0.02
) -> jnp.ndarray:
    """Linear schedule. The reference overrides the passed bounds with
    (1e-4, 0.01) unconditionally (utils.py:91-92); reproduced here."""
    del beta_start, beta_end
    betas = np.linspace(1e-4, 0.01, timesteps, dtype=np.float64)
    return jnp.asarray(betas, dtype=jnp.float32)


def alphas_cumprod_from_betas(betas: jnp.ndarray) -> jnp.ndarray:
    """alpha-bar_t = prod_{s<=t} (1 - beta_s), float32, shape (T,)."""
    return jnp.cumprod(1.0 - betas.astype(jnp.float32), axis=0)


def ddim_noise_range(num_steps: int, max_noise_level: int = 1000) -> jnp.ndarray:
    """Subsampled absolute-noise-level grid used by the DDIM-style sampler.

    linspace(0, max-1, num_steps+1) cast to int — reference train_dit.py:309-315
    and generate.py:194. Returns int32 of shape (num_steps + 1,).
    """
    grid = np.linspace(0.0, float(max_noise_level - 1), num_steps + 1)
    return jnp.asarray(grid.astype(np.int64), dtype=jnp.int32)


def make_diffusion_constants(
    ddim_noise_steps: int,
    max_noise_level: int = 1000,
    clamp_min: float = 1e-6,
):
    """Bundle (betas, alphas_cumprod, noise_range, stabilization_level) the way
    the trainer does (reference train_dit.py:286-327): clamp_min=1e-6 and
    stabilization_level = noise_range[1]."""
    betas = sigmoid_beta_schedule(max_noise_level, clamp_min=clamp_min)
    abar = alphas_cumprod_from_betas(betas)
    noise_range = ddim_noise_range(ddim_noise_steps, max_noise_level)
    stabilization_level = int(noise_range[1])
    return betas, abar, noise_range, stabilization_level
