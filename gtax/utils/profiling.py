"""Profiling, step timing, and MFU accounting.

The reference has no profiling at all (SURVEY.md §5); here it is first-class:
jax.profiler trace hooks, wall-clock step timing with warmup discard, and an
analytic FLOP model of the DiT for MFU certification.
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """Wall-clock timing with warmup discard and simple stats."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self._seen = 0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(1, len(self.times))

    @property
    def best(self) -> float:
        return min(self.times) if self.times else float("nan")


@contextlib.contextmanager
def trace(profile_dir: str | None):
    """jax.profiler trace context, no-op when profile_dir is None."""
    if profile_dir is None:
        yield
        return
    with jax.profiler.trace(profile_dir):
        yield


def dit_forward_flops(cfg, batch: int, frames: int) -> float:
    """Analytic FLOPs of one DiT forward (matmuls only, 2*M*N*K each).

    Covers patchify GEMM, per-block qkv/out/mlp/adaLN GEMMs, spatial+temporal
    attention score/value matmuls, and the final projection.
    """
    D = cfg.hidden_size
    gh, gw = cfg.grid_h, cfg.grid_w
    S = gh * gw
    tokens = batch * frames * S
    f = 0.0
    # patchify + final linear
    pin = cfg.in_channels * cfg.patch_size**2
    f += 2.0 * tokens * pin * D
    f += 2.0 * tokens * D * (cfg.patch_size**2 * cfg.in_channels)
    # conditioning
    f += 2.0 * batch * frames * (256 * D + D * D)
    per_block = 0.0
    # two attention branches: qkv (3D), out (D)
    per_block += 2.0 * (2.0 * tokens * D * 3 * D + 2.0 * tokens * D * D)
    # two MLPs
    per_block += 2.0 * (2.0 * 2.0 * tokens * D * cfg.mlp_hidden)
    # two adaLN heads on (batch*frames) tokens
    per_block += 2.0 * (2.0 * batch * frames * D * 6 * D)
    # attention scores+values: spatial S x S per frame, temporal T x T per pixel
    hd = cfg.head_dim
    per_block += 2.0 * 2.0 * batch * frames * cfg.num_heads * S * S * hd
    per_block += 2.0 * 2.0 * batch * S * cfg.num_heads * frames * frames * hd
    f += cfg.depth * per_block
    return f


def vae_flops(cfg, n_frames: int, decode: bool = True, encode: bool = True) -> float:
    """Analytic matmul FLOPs of VAE encode/decode for n_frames frames."""
    S = cfg.seq_len
    tokens = n_frames * S

    def block_flops(dim, heads, depth):
        per = 0.0
        per += 2.0 * tokens * dim * 3 * dim + 2.0 * tokens * dim * dim
        per += 2.0 * 2.0 * tokens * dim * int(dim * cfg.mlp_ratio)
        per += 2.0 * 2.0 * n_frames * heads * S * S * (dim // heads)
        return per * depth

    f = 0.0
    if encode:
        f += 2.0 * tokens * cfg.patch_dim * cfg.enc_dim
        f += block_flops(cfg.enc_dim, cfg.enc_heads, cfg.enc_depth)
        f += 2.0 * tokens * cfg.enc_dim * 2 * cfg.latent_dim
    if decode:
        f += 2.0 * tokens * cfg.latent_dim * cfg.dec_dim
        f += block_flops(cfg.dec_dim, cfg.dec_heads, cfg.dec_depth)
        f += 2.0 * tokens * cfg.dec_dim * cfg.patch_dim
    return f


class MFUCounter:
    """Model-FLOPs-utilisation against a peak-FLOPs figure for the platform."""

    # bf16 peak FLOP/s per chip (dense). v5e: 197 TFLOP/s, v4: 275, v5p: 459.
    # Keys must match REAL jax device_kind strings: v5e reports
    # "TPU v5 lite", v6e reports "TPU v6 lite" (marketing names don't appear
    # in device_kind — matching "v5e" here silently fell through to the
    # fallback and understated the peak ~2x, overstating MFU).
    PEAKS = {"v5 lite": 197e12, "v5e": 197e12, "v6 lite": 918e12,
             "v6e": 918e12, "v5p": 459e12, "v4": 275e12, "cpu": 1e12}

    @classmethod
    def peak_for_kind(cls, kind: str) -> float:
        kind = kind.lower()
        return next((v for k, v in cls.PEAKS.items() if k in kind), 100e12)

    def __init__(self, flops_per_step: float, n_devices: int = 1,
                 peak_per_device: float | None = None):
        self.flops_per_step = flops_per_step
        if peak_per_device is None:
            peak_per_device = self.peak_for_kind(
                jax.devices()[0].device_kind)
        self.peak = peak_per_device * n_devices

    def mfu(self, step_seconds: float) -> float:
        return self.flops_per_step / (step_seconds * self.peak)
