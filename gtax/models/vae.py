"""ViT autoencoder (AutoencoderKL) mapping 360x640 RGB frames to 16-channel
18x32 latent tokens.

Parity target: /root/reference/model/vae.py (AutoencoderKL :160-347,
Attention :47-112, AttentionBlock :115-157, ViT_L_20_Shallow_Encoder factory
:363-380). TPU-native shape: patchify as a GEMM, encoder/decoder blocks
stacked and scanned, partial pixel-axial RoPE computed from the closed form
(the reference stores it as a non-persistent buffer, so it is absent from
checkpoints).

Parameter tree (float32, Linear kernels (in, out)):
  patch_embed {kernel,bias}
  encoder / decoder: stacked blocks of
    {norm1{weight,bias}, attn{qkv{kernel,bias}, out{kernel,bias}},
     norm2{weight,bias}, mlp{fc1{kernel,bias}, fc2{kernel,bias}}}
  enc_norm / dec_norm {weight,bias}
  quant {kernel,bias}        (enc_dim -> 2*latent_dim; mean | logvar)
  post_quant {kernel,bias}   (latent_dim -> dec_dim)
  predictor {kernel,bias}    (dec_dim -> 3*patch^2)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gtax.core import rope
from gtax.nn import attention as attn
from gtax.nn.layers import gelu_exact, layer_norm, linear, mlp, patchify_embed


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    latent_dim: int = 16
    input_height: int = 360
    input_width: int = 640
    patch_size: int = 20
    enc_dim: int = 1024
    enc_depth: int = 6
    enc_heads: int = 16
    dec_dim: int = 1024
    dec_depth: int = 12
    dec_heads: int = 16
    mlp_ratio: float = 4.0

    @property
    def seq_h(self) -> int:
        return self.input_height // self.patch_size

    @property
    def seq_w(self) -> int:
        return self.input_width // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.seq_h * self.seq_w

    @property
    def patch_dim(self) -> int:
        return 3 * self.patch_size**2

    def param_count(self) -> int:
        # eval_shape: count from abstract shapes, no materialisation
        shapes = jax.eval_shape(
            lambda: vae_init(jax.random.PRNGKey(0), self))
        return sum(x.size for x in jax.tree.leaves(shapes))


def _xavier_uniform(key, shape):
    fan_in, fan_out = shape[0], shape[1]
    limit = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def vae_init(key, cfg: VAEConfig):
    """Xavier-uniform linears, zero biases, unit LayerNorms — reference
    model/vae.py:239-256."""
    keys = iter(jax.random.split(key, 16))

    def lin(din, dout):
        return {
            "kernel": _xavier_uniform(next(keys), (din, dout)),
            "bias": jnp.zeros((dout,), jnp.float32),
        }

    def ln(dim):
        return {"weight": jnp.ones((dim,), jnp.float32),
                "bias": jnp.zeros((dim,), jnp.float32)}

    def blocks(depth, dim, k):
        ks = jax.random.split(k, depth)

        def one(bk):
            bks = iter(jax.random.split(bk, 8))

            def blin(din, dout):
                return {
                    "kernel": _xavier_uniform(next(bks), (din, dout)),
                    "bias": jnp.zeros((dout,), jnp.float32),
                }

            return {
                "norm1": ln(dim),
                "attn": {"qkv": blin(dim, 3 * dim), "out": blin(dim, dim)},
                "norm2": ln(dim),
                "mlp": {
                    "fc1": blin(dim, int(dim * cfg.mlp_ratio)),
                    "fc2": blin(int(dim * cfg.mlp_ratio), dim),
                },
            }

        return jax.tree.map(lambda *xs: jnp.stack(xs), *[one(bk) for bk in ks])

    return {
        "patch_embed": lin(cfg.patch_dim, cfg.enc_dim),
        "encoder": blocks(cfg.enc_depth, cfg.enc_dim, next(keys)),
        "enc_norm": ln(cfg.enc_dim),
        "quant": lin(cfg.enc_dim, 2 * cfg.latent_dim),
        "post_quant": lin(cfg.latent_dim, cfg.dec_dim),
        "decoder": blocks(cfg.dec_depth, cfg.dec_dim, next(keys)),
        "dec_norm": ln(cfg.dec_dim),
        "predictor": lin(cfg.dec_dim, cfg.patch_dim),
    }


def _rope_table(cfg: VAEConfig, dim: int, num_heads: int):
    """Pixel-axial RoPE over the token grid rotating the first
    2*2*(head_dim//4) head dims (reference model/vae.py:71-76)."""
    head_dim = dim // num_heads
    freqs = rope.pixel_freqs(head_dim // 4, max_freq=float(cfg.seq_h * cfg.seq_w))
    return rope.axial_freqs(freqs, (cfg.seq_h, cfg.seq_w), pixel=True)


def _run_blocks(blocks, x, rope_freqs, num_heads, grid_hw, compute_dtype,
                fused=False):
    if fused:
        # whole block per Pallas call: weights stream once, frames sweep the
        # grid, no HBM round-trips for scores/LN/GELU (inference-only —
        # pallas_call has no autodiff and the VAE is frozen in training)
        from gtax.kernels.vae_block import fused_vae_block

        rf = rope_freqs.reshape(-1, rope_freqs.shape[-1])

        def fbody(carry, bp):
            h = fused_vae_block(
                carry,
                bp["norm1"]["weight"], bp["norm1"]["bias"],
                bp["attn"]["qkv"]["kernel"].astype(compute_dtype),
                bp["attn"]["qkv"]["bias"],
                bp["attn"]["out"]["kernel"].astype(compute_dtype),
                bp["attn"]["out"]["bias"],
                bp["norm2"]["weight"], bp["norm2"]["bias"],
                bp["mlp"]["fc1"]["kernel"].astype(compute_dtype),
                bp["mlp"]["fc1"]["bias"],
                bp["mlp"]["fc2"]["kernel"].astype(compute_dtype),
                bp["mlp"]["fc2"]["bias"],
                rf, num_heads,
            )
            return h, None

        out, _ = jax.lax.scan(fbody, x.astype(compute_dtype), blocks)
        return out

    def body(carry, bp):
        h = carry
        h = h + attn.vae_frame_attention(
            bp["attn"],
            layer_norm(h, weight=bp["norm1"]["weight"], bias=bp["norm1"]["bias"]),
            rope_freqs,
            num_heads,
            grid_hw,
            compute_dtype,
        )
        h = h + mlp(
            bp["mlp"],
            layer_norm(h, weight=bp["norm2"]["weight"], bias=bp["norm2"]["bias"]),
            gelu_exact,
            compute_dtype,
        )
        return h, None

    out, _ = jax.lax.scan(body, x, blocks)
    return out


def vae_encode(params, cfg: VAEConfig, x, compute_dtype=jnp.bfloat16,
               fused=False):
    """pixels (N, 3, H, W) in [-1, 1] -> (mean, logvar), each
    (N, seq_len, latent_dim); logvar clamped to [-30, 20]
    (reference model/vae.py:306-322 + DiagonalGaussianDistribution :19-45).
    fused=True runs each block as one Pallas kernel (inference only)."""
    h = patchify_embed(params["patch_embed"], x, cfg.patch_size, compute_dtype)
    h = h.reshape(h.shape[0], cfg.seq_len, cfg.enc_dim)
    rope_freqs = _rope_table(cfg, cfg.enc_dim, cfg.enc_heads)
    h = _run_blocks(
        params["encoder"], h, rope_freqs, cfg.enc_heads,
        (cfg.seq_h, cfg.seq_w), compute_dtype, fused=fused,
    )
    h = layer_norm(
        h, weight=params["enc_norm"]["weight"], bias=params["enc_norm"]["bias"]
    )
    moments = linear(params["quant"], h, compute_dtype).astype(jnp.float32)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def vae_sample(mean, logvar, key):
    """Sample from the diagonal Gaussian posterior (reference vae.py:38-42)."""
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


@dataclasses.dataclass(frozen=True)
class DiagonalGaussian:
    """Posterior returned by the encoder — functional equivalent of the
    reference's DiagonalGaussianDistribution (model/vae.py:19-45): logvar
    pre-clamped to [-30, 20] by vae_encode; mode() == mean; deterministic
    posteriors have zero std."""

    mean: jnp.ndarray
    logvar: jnp.ndarray
    deterministic: bool = False

    @property
    def std(self):
        if self.deterministic:
            return jnp.zeros_like(self.mean)
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self):
        if self.deterministic:
            return jnp.zeros_like(self.mean)
        return jnp.exp(self.logvar)

    def sample(self, key):
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, self.mean.dtype
        )

    def mode(self):
        return self.mean


def vae_posterior(params, cfg: VAEConfig, x, compute_dtype=jnp.bfloat16,
                  deterministic: bool = False) -> DiagonalGaussian:
    """encode() returning the posterior object (reference vae.py:306-322)."""
    mean, logvar = vae_encode(params, cfg, x, compute_dtype)
    return DiagonalGaussian(mean=mean, logvar=logvar,
                            deterministic=deterministic)


def vae_autoencode(params, cfg: VAEConfig, x, key=None,
                   sample_posterior: bool = True,
                   compute_dtype=jnp.bfloat16):
    """Full encode->sample/mode->decode pass (reference vae.py:340-347).
    Returns (reconstruction, posterior, z)."""
    post = vae_posterior(params, cfg, x, compute_dtype)
    if sample_posterior and key is not None:
        z = post.sample(key)
    else:
        z = post.mode()
    rec = vae_decode(params, cfg, z, compute_dtype)
    return rec, post, z


def vae_decode(params, cfg: VAEConfig, z, compute_dtype=jnp.bfloat16,
               fused=False):
    """latents (N, seq_len, latent_dim) -> pixels (N, 3, H, W) in [-1, 1]
    (reference model/vae.py:324-338; unpatchify :279-304).
    fused=True runs each block as one Pallas kernel (inference only)."""
    h = linear(params["post_quant"], z, compute_dtype)
    rope_freqs = _rope_table(cfg, cfg.dec_dim, cfg.dec_heads)
    h = _run_blocks(
        params["decoder"], h, rope_freqs, cfg.dec_heads,
        (cfg.seq_h, cfg.seq_w), compute_dtype, fused=fused,
    )
    h = layer_norm(
        h, weight=params["dec_norm"]["weight"], bias=params["dec_norm"]["bias"]
    )
    h = linear(params["predictor"], h, compute_dtype).astype(jnp.float32)

    # unpatchify: patch feature ordering (c, ph, pw) — reference vae.py:279-304
    N = h.shape[0]
    p = cfg.patch_size
    h = h.reshape(N, cfg.seq_h, cfg.seq_w, 3, p, p)
    h = h.transpose(0, 3, 1, 4, 2, 5)  # (N, 3, seq_h, p, seq_w, p)
    return h.reshape(N, 3, cfg.input_height, cfg.input_width)


def ViT_L_20_Shallow_Encoder(latent_dim: int = 16) -> VAEConfig:
    """Flagship VAE config (reference model/vae.py:363-380)."""
    return VAEConfig(
        latent_dim=latent_dim,
        patch_size=20,
        enc_dim=1024,
        enc_depth=6,
        enc_heads=16,
        dec_dim=1024,
        dec_depth=12,
        dec_heads=16,
        input_height=360,
        input_width=640,
    )


def VAE_debug() -> VAEConfig:
    """Tiny preset for smoke runs (pairs with 'DiT-debug': 48x64 frames,
    8-channel 6x8 latents). head_dim = 32 keeps the partial pixel RoPE
    (head_dim//4 rotated pairs) exercised."""
    return VAEConfig(
        latent_dim=8,
        input_height=48,
        input_width=64,
        patch_size=8,
        enc_dim=64,
        enc_depth=1,
        enc_heads=2,
        dec_dim=64,
        dec_depth=1,
        dec_heads=2,
    )


VAE_MODELS = {
    "vit-l-20-shallow-encoder": ViT_L_20_Shallow_Encoder,
    "vae-debug": VAE_debug,
}
