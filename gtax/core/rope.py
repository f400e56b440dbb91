"""Rotary position embeddings (RoPE), lang + pixel-axial flavours.

Behavioural parity target: the vendored lucidrains implementation at
/root/reference/model/rotary_embedding_torch.py —
  - lang freqs:   1/theta^(2i/dim)                      (ref :120-123)
  - pixel freqs:  linspace(1, max_freq/2, dim//2) * pi   (ref :124-125)
  - axial freqs over N dims with pixel axes positioned at
    linspace(-1, 1, axis_len)                            (ref :290-317)
  - interleaved-pair rotation (rotate_half)              (ref :39-43)
  - rotation math forced to float32 regardless of compute dtype
    (ref :46, :319 — @autocast(enabled=False))

Everything here is a pure function of small inputs; under jit the frequency
tables constant-fold, so there is no need for the reference's caching buffers.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def lang_freqs(dim: int, theta: float = 10000.0) -> jnp.ndarray:
    """Standard RoPE inverse-frequency vector, shape (dim//2,), float32."""
    exponents = np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim
    return jnp.asarray(1.0 / (theta**exponents), dtype=jnp.float32)


def pixel_freqs(dim: int, max_freq: float) -> jnp.ndarray:
    """Pixel-flavour frequency vector: linspace(1, max_freq/2, dim//2)*pi."""
    f = np.linspace(1.0, max_freq / 2.0, dim // 2, dtype=np.float64) * math.pi
    return jnp.asarray(f, dtype=jnp.float32)


def seq_freqs(positions: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Outer product of positions and freqs with each frequency repeated twice
    along the last axis — (..., n) -> (..., 2n) as [f0,f0,f1,f1,...]
    (ref :336-337 `repeat(freqs, '... n -> ... (n r)', r=2)`)."""
    f = positions.astype(jnp.float32)[..., None] * freqs.astype(jnp.float32)
    return jnp.repeat(f, 2, axis=-1)


def axial_freqs(freqs: jnp.ndarray, dims: tuple[int, ...], pixel: bool) -> jnp.ndarray:
    """N-dimensional axial frequency grid, shape (*dims, len(dims)*2*|freqs|).

    For pixel flavour the last two axes use positions linspace(-1, 1, d);
    earlier axes (and the lang flavour) use arange(d) (ref :294-302). The
    reference only ever calls this with 2-D grids where both axes are pixel.
    """
    per_axis = []
    n = len(dims)
    for ind, d in enumerate(dims):
        use_pixel = pixel and ind >= n - 2
        if use_pixel:
            pos = jnp.linspace(-1.0, 1.0, d, dtype=jnp.float32)
        else:
            pos = jnp.arange(d, dtype=jnp.float32)
        sf = seq_freqs(pos, freqs)  # (d, 2*|freqs|)
        shape = [1] * n + [sf.shape[-1]]
        shape[ind] = d
        per_axis.append(sf.reshape(shape))
    broadcast_shape = tuple(dims) + (per_axis[0].shape[-1],)
    per_axis = [jnp.broadcast_to(a, broadcast_shape) for a in per_axis]
    return jnp.concatenate(per_axis, axis=-1)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """Interleaved-pair rotation: (..., [x0,x1,x2,x3,...]) ->
    (..., [-x1,x0,-x3,x2,...]) (ref :39-43)."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack((-x2, x1), axis=-1).reshape(*x.shape[:-2], -1)


def apply_rotary_emb(
    freqs: jnp.ndarray, t: jnp.ndarray, start_index: int = 0
) -> jnp.ndarray:
    """Rotate the slice t[..., start:start+rot_dim] by `freqs`; the rest of the
    feature dim passes through untouched. Rotation math runs in float32 and the
    result is cast back to t.dtype (ref :46-73)."""
    dtype = t.dtype
    rot_dim = freqs.shape[-1]
    end_index = start_index + rot_dim
    assert rot_dim <= t.shape[-1], (
        f"feature dim {t.shape[-1]} too small to rotate {rot_dim} positions"
    )
    t32 = t.astype(jnp.float32)
    left = t32[..., :start_index]
    mid = t32[..., start_index:end_index]
    right = t32[..., end_index:]
    f32 = freqs.astype(jnp.float32)
    mid = mid * jnp.cos(f32) + rotate_half(mid) * jnp.sin(f32)
    return jnp.concatenate([left, mid, right], axis=-1).astype(dtype)


def temporal_rope_freqs(positions: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Frequency table for 1-D temporal RoPE at integer `positions`,
    shape (T, 2*|freqs|). Equivalent to the reference's
    rotate_queries_or_keys path (ref :191-209) with offset 0."""
    return seq_freqs(positions, freqs)
