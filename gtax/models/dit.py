"""Spatiotemporal DiT latent video denoiser.

Parity target: /root/reference/model/dit.py (DiT, SpatioTemporalDiTBlock,
FinalLayer, DiT_S_2 factory at :379-389). Same math, TPU-native shape:

  - patchify is a reshaped GEMM (gtax.nn.layers.patchify_embed), not a conv;
  - the `depth` transformer blocks are stacked on a leading axis and executed
    with one `lax.scan`, so XLA compiles a single block body regardless of
    depth (faster compiles, identical numerics);
  - temporal attention takes a per-slot validity mask so a fixed
    `max_frames`-slot window serves growing-context rollouts under one
    compiled shape.

Parameter tree (all float32; Linear kernels are (in, out)):
  patch_embed {kernel,bias}
  t_embedder  {fc1{kernel,bias}, fc2{kernel,bias}}
  external_cond {kernel,bias}               (present iff external_cond_dim>0;
                                             the shipped no-action checkpoint
                                             still carries it, ref dit.py:388)
  spatial_rope_freqs  (head_dim//4,)        pixel freqs (saved in torch ckpts
  temporal_rope_freqs (head_dim//2,)         as nn.Parameters)
  blocks: each leaf has leading dim `depth`:
    {s,t}_adaln {kernel,bias}   (D -> 6D)
    {s,t}_attn  {qkv{kernel}, out{kernel,bias}}
    {s,t}_mlp   {fc1{kernel,bias}, fc2{kernel,bias}}
  final {adaln{kernel,bias}, linear{kernel,bias}}
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gtax.core import rope
from gtax.nn import attention as attn
from gtax.nn.layers import (
    adaln,
    gate,
    gelu_tanh,
    layer_norm,
    linear,
    mlp,
    modulate,
    patchify_embed,
    timestep_embedder,
)


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    input_h: int = 18
    input_w: int = 32
    patch_size: int = 2
    in_channels: int = 16
    hidden_size: int = 1024
    depth: int = 16
    num_heads: int = 16
    mlp_ratio: float = 4.0
    external_cond_dim: int = 25
    max_frames: int = 5
    # lax.scan unroll factor over the stacked blocks (perf knob: trades
    # compile time / code size for less loop overhead)
    scan_unroll: int = 1
    # rematerialise each block in backward (jax.checkpoint on the scan body):
    # the bwd pass stores only per-block boundary activations instead of every
    # block's interior — the memory lever that fits flagship training on one
    # chip. Rematting the WHOLE forward instead does NOT help: the scan's
    # backward still stashes all 16 blocks' residuals at once.
    block_remat: bool = False
    # remat policy when block_remat is on: "full" recomputes the whole block
    # in backward (min memory, +1x forward FLOPs); "dots" saves every matmul
    # output (checkpoint_dots); "dots_nb" saves only non-batched GEMM outputs
    # (checkpoint_dots_with_no_batch_dims: qkv/out/fc1/fc2 projections) and
    # recomputes the attention score/PV dots + elementwise work — the
    # standard transformer remat recipe: near-3x-FLOP steps with the big f32
    # score tensors excluded from the residual set. MFU lever: docs/PERF.md.
    remat_policy: str = "full"

    @property
    def grid_h(self) -> int:
        return self.input_h // self.patch_size

    @property
    def grid_w(self) -> int:
        return self.input_w // self.patch_size

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def mlp_hidden(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)

    def param_count(self) -> int:
        # eval_shape: count from abstract shapes, no multi-GB materialisation
        shapes = jax.eval_shape(
            lambda: dit_init(jax.random.PRNGKey(0), self))
        return sum(x.size for x in jax.tree.leaves(shapes))


def _normal(key, shape, std):
    return jax.random.normal(key, shape, dtype=jnp.float32) * std


def dit_init(key, cfg: DiTConfig):
    """Initialise DiT params, matching reference initialize_weights
    (model/dit.py:295-326): linears normal(0.02)/zero-bias, t_embedder
    normal(0.01), adaLN heads zero, final adaLN normal(0.01), final linear
    normal(0.001)."""
    D, L = cfg.hidden_size, cfg.depth
    H6, H4 = 6 * D, cfg.mlp_hidden
    p, C = cfg.patch_size, cfg.in_channels
    keys = iter(jax.random.split(key, 64))

    def lin(k, din, dout, std=0.02, bias=True):
        prm = {"kernel": _normal(k, (din, dout), std)}
        if bias:
            prm["bias"] = jnp.zeros((dout,), jnp.float32)
        return prm

    def stack(fn):
        ks = jax.random.split(next(keys), L)
        return jax.tree.map(lambda *xs: jnp.stack(xs), *[fn(k) for k in ks])

    params = {
        "patch_embed": lin(next(keys), C * p * p, D),
        "t_embedder": {
            "fc1": lin(next(keys), 256, D, std=0.01),
            "fc2": lin(next(keys), D, D, std=0.01),
        },
        # reference: RotaryEmbedding(dim=head_dim//2, freqs_for="pixel",
        # max_freq=256) -> dim//2 = head_dim//4 freqs; the 2-axis axial table
        # then spans the full head_dim (model/dit.py:259-261)
        "spatial_rope_freqs": rope.pixel_freqs(cfg.head_dim // 2, max_freq=256.0),
        "temporal_rope_freqs": rope.lang_freqs(cfg.head_dim),
        "blocks": stack(
            lambda k: _block_init(k, D, H4, H6)
        ),
        "final": {
            "adaln": lin(next(keys), D, 2 * D, std=0.01),
            "linear": lin(next(keys), D, p * p * C, std=0.001),
        },
    }
    if cfg.external_cond_dim > 0:
        params["external_cond"] = lin(next(keys), cfg.external_cond_dim, D)
    return params


def _block_init(key, D, H4, H6):
    ks = iter(jax.random.split(key, 16))

    def lin(din, dout, std=0.02, bias=True, zero=False):
        k = next(ks)
        w = jnp.zeros((din, dout), jnp.float32) if zero else _normal(k, (din, dout), std)
        prm = {"kernel": w}
        if bias:
            prm["bias"] = jnp.zeros((dout,), jnp.float32)
        return prm

    def branch():
        return {
            "adaln": lin(D, H6, zero=True),
            "attn": {"qkv": lin(D, 3 * D, bias=False), "out": lin(D, D)},
            "mlp": {"fc1": lin(D, H4), "fc2": lin(H4, D)},
        }

    s, t = branch(), branch()
    return {
        "s_adaln": s["adaln"],
        "s_attn": s["attn"],
        "s_mlp": s["mlp"],
        "t_adaln": t["adaln"],
        "t_attn": t["attn"],
        "t_mlp": t["mlp"],
    }


def _block_apply(x, c, bp, spatial_freqs, temporal_freqs, num_heads, valid,
                 dtype, attn_cache=None, collect=False, mods=None):
    """One SpatioTemporalDiTBlock (reference model/dit.py:200-225).

    Attention-broadcast support (Pyramid Attention Broadcast,
    arxiv 2408.12588 — attention outputs change slowly across adjacent
    denoise steps): with collect=True the block also returns the two
    attention branches' GATED RESIDUAL DELTAS (x_after - x_before); with
    attn_cache=(delta_s, delta_t) the attention branches are SKIPPED and the
    cached deltas are added instead (MLP branches always recompute). Caching
    the post-gate delta works identically under every attention backend.

    mods: optional precomputed adaLN head outputs for this block
    ({"s": (B,T,6D), "t": (B,T,6D)} from dit_cond) — the conditioning cache
    that lets serving rollouts skip the adaLN GEMMs entirely (c is then
    unused). Bit-exact: the cached values are the same adaln() outputs."""
    if mods is not None:
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mods["s"], 6, axis=-1)
    else:
        sh1, sc1, g1, sh2, sc2, g2 = adaln(bp["s_adaln"], c, 6, dtype)
    dtype_name = jnp.dtype(dtype).name
    # W8A8 serving params (quantize_for_inference) carry "kernel_q" leaves;
    # they can only run through the int8 Pallas kernels, whatever the backend
    quant = "kernel_q" in bp["s_attn"]["qkv"]
    x_pre_s = x
    if attn_cache is not None:
        x = x + attn_cache[0].astype(x.dtype)
    elif quant:
        from gtax.kernels.quant import fused_spatial_branch_q

        B, T, gh, gw, D = x.shape
        S = gh * gw
        x = fused_spatial_branch_q(
            x.reshape(B * T, S, D),
            sh1.reshape(B * T, D),
            sc1.reshape(B * T, D),
            g1.reshape(B * T, D),
            bp["s_attn"]["qkv"]["kernel_q"],
            bp["s_attn"]["qkv"]["scale"],
            bp["s_attn"]["out"]["kernel_q"],
            bp["s_attn"]["out"]["scale"],
            bp["s_attn"]["out"]["bias"],
            spatial_freqs.reshape(S, -1),
            num_heads,
        ).reshape(B, T, gh, gw, D)
    elif attn.get_backend() in ("fused", "fused_all"):
        # whole spatial attention branch as one VMEM-resident Pallas kernel;
        # the trainable wrapper adds an XLA-autodiff backward (custom_vjp) so
        # the fused backend is legal under value_and_grad
        from gtax.nn.branches import trainable_spatial_branch, use_int8_fwd

        B, T, gh, gw, D = x.shape
        S = gh * gw
        x = trainable_spatial_branch(num_heads, dtype_name, use_int8_fwd())(
            x.reshape(B * T, S, D),
            sh1.reshape(B * T, D),
            sc1.reshape(B * T, D),
            g1.reshape(B * T, D),
            bp["s_attn"]["qkv"]["kernel"].astype(dtype),
            bp["s_attn"]["out"]["kernel"].astype(dtype),
            bp["s_attn"]["out"]["bias"],
            spatial_freqs.reshape(S, -1),
        ).reshape(B, T, gh, gw, D)
    else:
        x = x + gate(
            attn.spatial_axial_attention(
                bp["s_attn"], modulate(layer_norm(x), sh1, sc1), spatial_freqs,
                num_heads, dtype,
            ),
            g1,
        )
    def mlp_branch(x, prms, shift, scale, g):
        # single-pass whole-branch MLP kernel (weights VMEM-resident, LN
        # computed once — the fix for round-1's chunked negative result)
        if quant:
            from gtax.kernels.quant import fused_mlp_branch_q

            B, T, gh, gw, D = x.shape
            S = gh * gw
            return fused_mlp_branch_q(
                x.reshape(B * T, S, D),
                shift.reshape(B * T, D),
                scale.reshape(B * T, D),
                g.reshape(B * T, D),
                prms["fc1"]["kernel_q"],
                prms["fc1"]["scale"],
                prms["fc1"]["bias"],
                prms["fc2"]["kernel_q"],
                prms["fc2"]["scale"],
                prms["fc2"]["bias"],
            ).reshape(B, T, gh, gw, D)
        if attn.get_backend() in ("fused_mlp", "fused_all"):
            from gtax.nn.branches import trainable_mlp_branch, use_int8_fwd

            B, T, gh, gw, D = x.shape
            S = gh * gw
            return trainable_mlp_branch(dtype_name, use_int8_fwd())(
                x.reshape(B * T, S, D),
                shift.reshape(B * T, D),
                scale.reshape(B * T, D),
                g.reshape(B * T, D),
                prms["fc1"]["kernel"].astype(dtype),
                prms["fc1"]["bias"],
                prms["fc2"]["kernel"].astype(dtype),
                prms["fc2"]["bias"],
            ).reshape(B, T, gh, gw, D)
        return x + gate(
            mlp(prms, modulate(layer_norm(x), shift, scale), gelu_tanh, dtype),
            g,
        )

    delta_s = (x - x_pre_s).astype(dtype) if collect else None
    x = mlp_branch(x, bp["s_mlp"], sh2, sc2, g2)

    if mods is not None:
        th1, tc1, tg1, th2, tc2, tg2 = jnp.split(mods["t"], 6, axis=-1)
    else:
        th1, tc1, tg1, th2, tc2, tg2 = adaln(bp["t_adaln"], c, 6, dtype)
    x_pre_t = x
    if attn_cache is not None:
        x = x + attn_cache[1].astype(x.dtype)
    elif quant:
        from gtax.kernels.quant import fused_temporal_branch_q

        assert valid is None or valid.ndim == 1, (
            "quantized params serve inference rollouts only (valid must be "
            "None or a (T,) mask)"
        )
        B, T, gh, gw, D = x.shape
        S = gh * gw
        x = fused_temporal_branch_q(
            x.reshape(B * T, S, D),
            th1.reshape(B * T, D),
            tc1.reshape(B * T, D),
            tg1.reshape(B * T, D),
            bp["t_attn"]["qkv"]["kernel_q"],
            bp["t_attn"]["qkv"]["scale"],
            bp["t_attn"]["out"]["kernel_q"],
            bp["t_attn"]["out"]["scale"],
            bp["t_attn"]["out"]["bias"],
            temporal_freqs,
            valid,
            num_heads,
            T,
        ).reshape(B, T, gh, gw, D)
    elif attn.get_backend() in ("fused", "fused_all") and (
            valid is None or valid.ndim == 1
    ):
        from gtax.nn.branches import trainable_temporal_branch, use_int8_fwd

        B, T, gh, gw, D = x.shape
        S = gh * gw
        fn = trainable_temporal_branch(num_heads, T, valid is not None,
                                       dtype_name, use_int8_fwd())
        args = (
            x.reshape(B * T, S, D),
            th1.reshape(B * T, D),
            tc1.reshape(B * T, D),
            tg1.reshape(B * T, D),
            bp["t_attn"]["qkv"]["kernel"].astype(dtype),
            bp["t_attn"]["out"]["kernel"].astype(dtype),
            bp["t_attn"]["out"]["bias"],
            temporal_freqs,
        )
        if valid is not None:
            args = args + (valid,)
        x = fn(*args).reshape(B, T, gh, gw, D)
    else:
        x = x + gate(
            attn.temporal_axial_attention(
                bp["t_attn"], modulate(layer_norm(x), th1, tc1), temporal_freqs,
                num_heads, valid, dtype,
            ),
            tg1,
        )
    delta_t = (x - x_pre_t).astype(dtype) if collect else None
    x = mlp_branch(x, bp["t_mlp"], th2, tc2, tg2)
    if collect:
        return x, (delta_s, delta_t)
    return x


def dit_apply(
    params,
    cfg: DiTConfig,
    x,
    t,
    external_cond=None,
    valid=None,
    compute_dtype=jnp.bfloat16,
    attn_cache=None,
    collect_cache=False,
    mods=None,
):
    """DiT forward pass (reference model/dit.py:343-376).

    x: (B, T, C, H, W) latents; t: (B, T) integer noise levels;
    external_cond: optional (B, T, action_dim) one-hot actions;
    valid: optional (T,) or (B, T) bool mask of real (non-padding) frames.
    Returns v-prediction of x's shape, float32.

    Attention broadcast (inference acceleration, see _block_apply):
    collect_cache=True additionally returns the per-block attention residual
    deltas; attn_cache=<that pytree> skips all attention branches and reuses
    the deltas. Not combinable with block_remat.

    mods: optional conditioning cache from dit_cond (serving acceleration:
    the adaLN heads carry ~1/3 of the DiT weight bytes for 5 rows of input;
    rollouts precompute their outputs per frame instead of streaming the
    weights every denoise step — docs/PERF.md). When given, t/external_cond
    are ignored (may be None) and params must be in the unstacked serving
    layout (unstack_for_inference). Bit-exact vs the uncached path.
    """
    B, T, C, H, W = x.shape
    gh, gw = cfg.grid_h, cfg.grid_w

    h = patchify_embed(
        params["patch_embed"],
        x.reshape(B * T, C, H, W),
        cfg.patch_size,
        compute_dtype,
    ).reshape(B, T, gh, gw, cfg.hidden_size)

    if mods is not None:
        if not isinstance(params["blocks"], (list, tuple)):
            raise ValueError(
                "dit_apply(mods=...) requires the unstacked serving layout "
                "(unstack_for_inference)"
            )
        spatial_freqs = rope.axial_freqs(
            jax.lax.stop_gradient(params["spatial_rope_freqs"]), (gh, gw),
            pixel=True,
        )
        temporal_freqs = rope.temporal_rope_freqs(
            jnp.arange(T), jax.lax.stop_gradient(params["temporal_rope_freqs"])
        )
        deltas = []
        for i, bp in enumerate(params["blocks"]):
            out = _block_apply(
                h, None, bp, spatial_freqs, temporal_freqs, cfg.num_heads,
                valid, compute_dtype,
                attn_cache=None if attn_cache is None else attn_cache[i],
                collect=collect_cache,
                mods=mods["blocks"][i],
            )
            if collect_cache:
                h, d = out
                deltas.append(d)
            else:
                h = out
        h = _dit_head(params, cfg, h, None, B, T, gh, gw, compute_dtype,
                      final_mods=mods["final"])
        return (h, tuple(deltas)) if collect_cache else h

    c = timestep_embedder(
        params["t_embedder"], t.reshape(B * T), compute_dtype=compute_dtype
    ).reshape(B, T, cfg.hidden_size)
    if external_cond is not None:
        c = c + linear(params["external_cond"], external_cond, compute_dtype)

    # rope frequency tables are NON-trainable (reference RotaryEmbedding uses
    # learned_freq=False — rotary_embedding_torch.py:138-144); without
    # stop_gradient AdamW would drift them away from the shipped checkpoints
    spatial_freqs = rope.axial_freqs(
        jax.lax.stop_gradient(params["spatial_rope_freqs"]), (gh, gw),
        pixel=True,
    )
    temporal_freqs = rope.temporal_rope_freqs(
        jnp.arange(T), jax.lax.stop_gradient(params["temporal_rope_freqs"])
    )

    use_cache = attn_cache is not None or collect_cache
    if isinstance(params["blocks"], (list, tuple)):
        # INFERENCE fast path: blocks pre-unstacked into per-block pytrees
        # (unstack_for_inference). A Python loop over separate weight arrays
        # contains NO weight slicing in the compiled program — the lax.scan
        # over stacked weights dynamic-slices every Pallas operand into an
        # HBM->HBM copy (~1.2 ms/forward at flagship size), which neither
        # scan-unroll nor scalar prefetch recovers (docs/PERF.md). Measured
        # 5.56 ms vs 7.4 ms per forward (fused_all, v5e). Compile time is
        # ~16x the scan body; amortised over a serving session.
        deltas = []
        for i, bp in enumerate(params["blocks"]):
            out = _block_apply(
                h, c, bp, spatial_freqs, temporal_freqs, cfg.num_heads,
                valid, compute_dtype,
                attn_cache=None if attn_cache is None else attn_cache[i],
                collect=collect_cache,
            )
            if collect_cache:
                h, d = out
                deltas.append(d)
            else:
                h = out
        h = _dit_head(params, cfg, h, c, B, T, gh, gw, compute_dtype)
        return (h, tuple(deltas)) if collect_cache else h

    if use_cache:
        # stacked layout: cache is a pair of stacked (L, ...) delta arrays
        # threaded through the block scan as xs / collected as ys
        assert not cfg.block_remat, "attention broadcast is inference-only"
        stacked = params["blocks"]
        if collect_cache:
            def body(carry, bp):
                xo, d = _block_apply(
                    carry, c, bp, spatial_freqs, temporal_freqs,
                    cfg.num_heads, valid, compute_dtype, collect=True,
                )
                return xo, d

            h, cache = jax.lax.scan(body, h, stacked,
                                    unroll=cfg.scan_unroll)
            h = _dit_head(params, cfg, h, c, B, T, gh, gw, compute_dtype)
            return h, cache

        def body(carry, inp):
            bp, ds, dt_ = inp
            return (
                _block_apply(
                    carry, c, bp, spatial_freqs, temporal_freqs,
                    cfg.num_heads, valid, compute_dtype,
                    attn_cache=(ds, dt_),
                ),
                None,
            )

        h, _ = jax.lax.scan(body, h, (stacked, *attn_cache),
                            unroll=cfg.scan_unroll)
        h = _dit_head(params, cfg, h, c, B, T, gh, gw, compute_dtype)
        return h

    block = _block_apply
    if cfg.block_remat:
        policy = {
            "dots": jax.checkpoint_policies.checkpoint_dots,
            "dots_nb":
                jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
        }.get(cfg.remat_policy)
        # num_heads (5) and dtype (7) are static python values
        block = jax.checkpoint(_block_apply, static_argnums=(5, 7),
                               policy=policy)

    def body(carry, bp):
        return (
            block(
                carry, c, bp, spatial_freqs, temporal_freqs, cfg.num_heads,
                valid, compute_dtype,
            ),
            None,
        )

    h, _ = jax.lax.scan(body, h, params["blocks"], unroll=cfg.scan_unroll)

    return _dit_head(params, cfg, h, c, B, T, gh, gw, compute_dtype)


def _dit_head(params, cfg, h, c, B, T, gh, gw, compute_dtype,
              final_mods=None):
    """FinalLayer + unpatchify (reference model/dit.py:126-145, 328-341)."""
    C = cfg.in_channels
    if final_mods is not None:
        shift, scale = jnp.split(final_mods, 2, axis=-1)
    else:
        shift, scale = adaln(params["final"]["adaln"], c, 2, compute_dtype)
    h = modulate(layer_norm(h), shift, scale)
    h = linear(params["final"]["linear"], h, compute_dtype)

    # unpatchify: feature ordering (ph, pw, channel), reference dit.py:328-341
    p = cfg.patch_size
    h = h.reshape(B, T, gh, gw, p, p, C)
    h = h.transpose(0, 1, 6, 2, 4, 3, 5)  # (B,T,C,gh,p,gw,p)
    return h.reshape(B, T, C, gh * p, gw * p).astype(jnp.float32)


def init_attn_cache(params, cfg: DiTConfig, B: int, T: int,
                    dtype=jnp.bfloat16):
    """Zero attention-broadcast cache matching dit_apply's collect_cache
    output pytree for the given block layout (stacked vs unstacked)."""
    shape = (B, T, cfg.grid_h, cfg.grid_w, cfg.hidden_size)
    z = jnp.zeros(shape, dtype)
    if isinstance(params["blocks"], (list, tuple)):
        return tuple((z, z) for _ in range(cfg.depth))
    zs = jnp.zeros((cfg.depth,) + shape, dtype)
    return (zs, zs)


def make_pab_fns(cfg: DiTConfig, compute_dtype=jnp.bfloat16):
    """(collect_fn, reuse_fn, init_cache_fn) for
    gtax.sampling.diffusion.make_rollout(pab=...) — attention broadcast."""

    def collect(params, x, t, a, valid):
        return dit_apply(params, cfg, x, t, a, valid,
                         compute_dtype=compute_dtype, collect_cache=True)

    def reuse(params, x, t, a, valid, cache):
        return dit_apply(params, cfg, x, t, a, valid,
                         compute_dtype=compute_dtype, attn_cache=cache)

    def init_cache(params, B, T):
        return init_attn_cache(params, cfg, B, T, compute_dtype)

    return collect, reuse, init_cache


def dit_cond(params, cfg: DiTConfig, t, external_cond=None,
             compute_dtype=jnp.bfloat16):
    """Precompute every conditioning-derived tensor of the DiT forward: the
    per-block spatial/temporal adaLN head outputs plus the FinalLayer adaLN.

    The conditioning path (timestep embed -> +action embed -> SiLU -> 32+1
    adaLN GEMMs, reference model/dit.py:204-217, 137-139) depends only on
    (t, external_cond) and is row-wise independent — but its weights are
    ~1/3 of the DiT's bytes, streamed from HBM for just B*T rows of input on
    every call. Serving rollouts therefore precompute the outputs for all
    noise levels of a frame's denoise trajectory ONCE (see
    gtax.sampling.diffusion.denoise_window cond path) and gather rows per
    step. Bit-exact vs dit_apply's inline computation: identical adaln/linear
    calls (row batching does not change per-row GEMM results), including the
    int8 path's per-row dynamic activation quantization.

    t: (B, T) int32; external_cond: optional (B, T, A).
    Returns {"blocks": tuple per block of {"s","t"}: (B, T, 6D), "final":
    (B, T, 2D)} in the compute dtype — ~(12*depth+2)*D floats per row.
    """
    if not isinstance(params["blocks"], (list, tuple)):
        raise ValueError(
            "dit_cond requires the unstacked serving layout "
            "(unstack_for_inference)"
        )
    B, T = t.shape
    c = timestep_embedder(
        params["t_embedder"], t.reshape(B * T), compute_dtype=compute_dtype
    ).reshape(B, T, cfg.hidden_size)
    if external_cond is not None:
        c = c + linear(params["external_cond"], external_cond, compute_dtype)
    # adaln() = SiLU -> Linear -> split; hoist the (shared) SiLU, keep each
    # head's unsplit output — _block_apply/_dit_head split at use site
    h = jax.nn.silu(c.astype(jnp.float32)).astype(compute_dtype)
    blocks = tuple(
        {
            "s": linear(bp["s_adaln"], h, compute_dtype),
            "t": linear(bp["t_adaln"], h, compute_dtype),
        }
        for bp in params["blocks"]
    )
    final = linear(params["final"]["adaln"], h, compute_dtype)
    return {"blocks": blocks, "final": final}


def make_cond_fns(cfg: DiTConfig, compute_dtype=jnp.bfloat16):
    """(cond_fn, apply_fn) for gtax.sampling.diffusion rollouts' `cond=`
    conditioning cache — cond_fn(params, t, a) -> mods;
    apply_fn(params, x, mods, valid) -> v."""

    def cond_fn(params, t, a):
        return dit_cond(params, cfg, t, a, compute_dtype)

    def apply_fn(params, x, mods, valid):
        return dit_apply(params, cfg, x, None, None, valid,
                         compute_dtype=compute_dtype, mods=mods)

    return cond_fn, apply_fn


# ------------------------------------------------- incremental decoding
#
# On the exact sampling path only the window's LAST frame changes between
# denoise steps: context rows' activations are step-invariant at every block
# (spatial attention is per-frame, temporal attention is causal, everything
# else is row-wise; their conditioning is pinned at the stabilization level).
# So a rollout can PREFILL the context once per generated frame — running the
# blocks over the T-1 context rows and caching each block's post-rope
# temporal K/V — and then per denoise step compute ONLY the last frame
# through the stack (~1/T of the FLOPs), its temporal attention reading the
# cached K/V. The reference semantics are preserved exactly; this is the
# KV-cache idea adapted to diffusion-forcing windows (reference rollout:
# generate.py:200-235 recomputes the full window every step).


def _spatial_branch_call(ap, h, sh, sc, g, freqs, num_heads, dtype):
    """One fused spatial-attention branch over (N, S, D) rows (quant-aware)."""
    if "kernel_q" in ap["qkv"]:
        from gtax.kernels.quant import fused_spatial_branch_q

        return fused_spatial_branch_q(
            h, sh, sc, g, ap["qkv"]["kernel_q"], ap["qkv"]["scale"],
            ap["out"]["kernel_q"], ap["out"]["scale"], ap["out"]["bias"],
            freqs, num_heads,
        )
    from gtax.kernels.block import fused_spatial_branch

    return fused_spatial_branch(
        h, sh, sc, g, ap["qkv"]["kernel"].astype(dtype),
        ap["out"]["kernel"].astype(dtype), ap["out"]["bias"], freqs,
        num_heads,
    )


def _mlp_branch_call(mp, h, sh, sc, g, dtype):
    """One fused MLP branch over (N, S, D) rows (quant-aware)."""
    if "kernel_q" in mp["fc1"]:
        from gtax.kernels.quant import fused_mlp_branch_q

        return fused_mlp_branch_q(
            h, sh, sc, g, mp["fc1"]["kernel_q"], mp["fc1"]["scale"],
            mp["fc1"]["bias"], mp["fc2"]["kernel_q"], mp["fc2"]["scale"],
            mp["fc2"]["bias"],
        )
    from gtax.kernels.block import fused_mlp_branch

    return fused_mlp_branch(
        h, sh, sc, g, mp["fc1"]["kernel"].astype(dtype), mp["fc1"]["bias"],
        mp["fc2"]["kernel"].astype(dtype), mp["fc2"]["bias"],
    )


# Paired attention+MLP kernels win where per-call DMA/dispatch overhead
# dominates (few live rows: B=1 exact serving measured 7.99 -> 8.16 f/s) but
# LOSE at batched row counts — at B=8 the fused Mosaic bodies run slower
# than the two separate kernels by more than the inter-kernel glue they
# eliminate (measured 14.1 -> 12.0 f/s aggregate; per-kernel: temporal pair
# 232 us vs 84+80 us sequential in-situ). Chunk-count, BlockSpec-shape and
# stacked-dot variants did not close the gap (docs/PERF.md round 3), so the
# pair is gated to small live-row counts where it measurably wins.
_PAIR_MAX_FRAMES = 2


def _spatial_pair_call(bp, h, sh1, sc1, g1, sh2, sc2, g2, freqs, num_heads,
                       dtype):
    """Spatial attention + spatial MLP for one block: a single paired kernel
    on the int8 path at small live-row counts (halves serving dispatches —
    gtax.kernels.pair), sequential branch kernels otherwise. Bit-equal
    either way."""
    ap, mp = bp["s_attn"], bp["s_mlp"]
    if "kernel_q" in ap["qkv"] and h.shape[0] <= _PAIR_MAX_FRAMES:
        from gtax.kernels.pair import fused_spatial_pair_q

        return fused_spatial_pair_q(
            h, sh1, sc1, g1, sh2, sc2, g2, ap["qkv"]["kernel_q"],
            ap["qkv"]["scale"], ap["out"]["kernel_q"], ap["out"]["scale"],
            ap["out"]["bias"], mp["fc1"]["kernel_q"], mp["fc1"]["scale"],
            mp["fc1"]["bias"], mp["fc2"]["kernel_q"], mp["fc2"]["scale"],
            mp["fc2"]["bias"], freqs, num_heads,
        )
    h = _spatial_branch_call(ap, h, sh1, sc1, g1, freqs, num_heads, dtype)
    return _mlp_branch_call(mp, h, sh2, sc2, g2, dtype)


def _temporal_pair_step_call(bp, h, th1, tc1, tg1, th2, tc2, tg2, k_ctx,
                             v_ctx, freqs, valid, num_heads, n_ctx, n_live,
                             dtype):
    """Incremental temporal step + temporal MLP for one block (paired int8
    kernel at small live-row counts / sequential fallback)."""
    ap, mp = bp["t_attn"], bp["t_mlp"]
    if "kernel_q" in ap["qkv"] and h.shape[0] <= _PAIR_MAX_FRAMES:
        from gtax.kernels.pair import fused_temporal_pair_q

        return fused_temporal_pair_q(
            h, th1, tc1, tg1, th2, tc2, tg2, ap["qkv"]["kernel_q"],
            ap["qkv"]["scale"], ap["out"]["kernel_q"], ap["out"]["scale"],
            ap["out"]["bias"], mp["fc1"]["kernel_q"], mp["fc1"]["scale"],
            mp["fc1"]["bias"], mp["fc2"]["kernel_q"], mp["fc2"]["scale"],
            mp["fc2"]["bias"], k_ctx, v_ctx, freqs, valid, num_heads, n_ctx,
            n_live=n_live,
        )
    if "kernel_q" in ap["qkv"]:
        from gtax.kernels.quant import fused_temporal_step_q

        h = fused_temporal_step_q(
            h, th1, tc1, tg1, ap["qkv"]["kernel_q"], ap["qkv"]["scale"],
            ap["out"]["kernel_q"], ap["out"]["scale"], ap["out"]["bias"],
            k_ctx, v_ctx, freqs, valid, num_heads, n_ctx, n_live=n_live,
        )
    else:
        from gtax.kernels.block import fused_temporal_step

        h = fused_temporal_step(
            h, th1, tc1, tg1, ap["qkv"]["kernel"].astype(dtype),
            ap["out"]["kernel"].astype(dtype), ap["out"]["bias"],
            k_ctx, v_ctx, freqs, valid, num_heads, n_ctx, n_live=n_live,
        )
    return _mlp_branch_call(mp, h, th2, tc2, tg2, dtype)


def _split6(m, rows, D):
    return [a.reshape(rows, D) for a in jnp.split(m, 6, axis=-1)]


def dit_prefill(params, cfg: DiTConfig, x_ctx, mods, valid_ctx,
                compute_dtype=jnp.bfloat16):
    """Context prefill for incremental decoding: run the blocks over the T-1
    context rows only and return each block's post-rope temporal (K, V)
    rows — exactly what the full-window forward computes for those rows
    (same kernels; the temporal kernel's emit_kv output).

    x_ctx: (B, Tc, C, H, W); mods: dit_cond output for the Tc context rows;
    valid_ctx: (Tc,) bool or None. Returns a tuple per block of
    (k, v): (B*Tc*S, D) in the compute dtype. Requires the unstacked layout
    and the fused/int8 kernels (inference-only)."""
    B, Tc, C, H, W = x_ctx.shape
    gh, gw = cfg.grid_h, cfg.grid_w
    S = gh * gw
    D = cfg.hidden_size
    h = patchify_embed(
        params["patch_embed"], x_ctx.reshape(B * Tc, C, H, W),
        cfg.patch_size, compute_dtype,
    ).reshape(B * Tc, S, D)
    spatial_freqs = rope.axial_freqs(
        jax.lax.stop_gradient(params["spatial_rope_freqs"]), (gh, gw),
        pixel=True,
    ).reshape(S, -1)
    # context rows occupy window slots 0..Tc-1: the first Tc rows of the
    # full-window rope table
    temporal_freqs = rope.temporal_rope_freqs(
        jnp.arange(Tc), jax.lax.stop_gradient(params["temporal_rope_freqs"])
    )
    kv = []
    rows = B * Tc
    for i, bp in enumerate(params["blocks"]):
        m = mods["blocks"][i]
        sh1, sc1, g1, sh2, sc2, g2 = _split6(m["s"], rows, D)
        th1, tc1, tg1, th2, tc2, tg2 = _split6(m["t"], rows, D)
        h = _spatial_pair_call(bp, h, sh1, sc1, g1, sh2, sc2, g2,
                               spatial_freqs, cfg.num_heads, compute_dtype)
        ap = bp["t_attn"]
        if "kernel_q" in ap["qkv"]:
            from gtax.kernels.quant import fused_temporal_branch_q

            h, kk, vv = fused_temporal_branch_q(
                h, th1, tc1, tg1, ap["qkv"]["kernel_q"], ap["qkv"]["scale"],
                ap["out"]["kernel_q"], ap["out"]["scale"], ap["out"]["bias"],
                temporal_freqs, valid_ctx, cfg.num_heads, Tc, emit_kv=True,
            )
        else:
            from gtax.kernels.block import fused_temporal_branch

            h, kk, vv = fused_temporal_branch(
                h, th1, tc1, tg1, ap["qkv"]["kernel"].astype(compute_dtype),
                ap["out"]["kernel"].astype(compute_dtype), ap["out"]["bias"],
                temporal_freqs, valid_ctx, cfg.num_heads, Tc, emit_kv=True,
            )
        kv.append((kk.reshape(B * Tc * S, D), vv.reshape(B * Tc * S, D)))
        h = _mlp_branch_call(bp["t_mlp"], h, th2, tc2, tg2, compute_dtype)
    return tuple(kv)


def dit_apply_step(params, cfg: DiTConfig, x_last, kv_cache, mods, valid,
                   compute_dtype=jnp.bfloat16):
    """Incremental DiT forward: ONLY the window's live frame(s) through the
    stack, temporal attention reading the prefilled context K/V.

    x_last: (B, Tl, C, H, W) — the window's LAST Tl slots (Tl=1 on the exact
    sampling path; Tl=pipeline_depth for pipelined rollouts whose in-flight
    frames all change per call while the first max_frames-Tl slots stay
    prefilled); kv_cache: dit_prefill output over those context slots; mods:
    dit_cond output for the live rows ((B, Tl, ...) leaves); valid: (T,) bool
    or None (full-window mask).
    Returns the v-prediction for the live frames, (B, Tl, C, H, W) float32 —
    per-row identical to dit_apply's output for those slots."""
    B, Tl = x_last.shape[:2]
    C, H, W = x_last.shape[2:]
    gh, gw = cfg.grid_h, cfg.grid_w
    S = gh * gw
    D = cfg.hidden_size
    T = cfg.max_frames
    n_ctx = T - Tl
    h = patchify_embed(
        params["patch_embed"], x_last.reshape(B * Tl, C, H, W),
        cfg.patch_size, compute_dtype,
    ).reshape(B * Tl, S, D)
    spatial_freqs = rope.axial_freqs(
        jax.lax.stop_gradient(params["spatial_rope_freqs"]), (gh, gw),
        pixel=True,
    ).reshape(S, -1)
    temporal_freqs = rope.temporal_rope_freqs(
        jnp.arange(T), jax.lax.stop_gradient(params["temporal_rope_freqs"])
    )
    rows = B * Tl
    for i, bp in enumerate(params["blocks"]):
        m = mods["blocks"][i]
        sh1, sc1, g1, sh2, sc2, g2 = _split6(m["s"], rows, D)
        th1, tc1, tg1, th2, tc2, tg2 = _split6(m["t"], rows, D)
        h = _spatial_pair_call(bp, h, sh1, sc1, g1, sh2, sc2, g2,
                               spatial_freqs, cfg.num_heads, compute_dtype)
        k_ctx, v_ctx = kv_cache[i]
        h = _temporal_pair_step_call(
            bp, h, th1, tc1, tg1, th2, tc2, tg2, k_ctx, v_ctx,
            temporal_freqs, valid, cfg.num_heads, n_ctx, Tl, compute_dtype)
    h = h.reshape(B, Tl, gh, gw, D)
    return _dit_head(params, cfg, h, None, B, Tl, gh, gw, compute_dtype,
                     final_mods=mods["final"])


def make_incremental_fns(cfg: DiTConfig, compute_dtype=jnp.bfloat16):
    """(prefill_fn, step_fn) for gtax.sampling.diffusion rollouts'
    `incremental=` mode (requires `cond=` too) —
    prefill_fn(params, x_ctx, mods_ctx, valid_ctx) -> kv_cache;
    step_fn(params, x_last, kv_cache, mods_last, valid) -> v_last."""

    def prefill_fn(params, x_ctx, mods_ctx, valid_ctx):
        return dit_prefill(params, cfg, x_ctx, mods_ctx, valid_ctx,
                           compute_dtype)

    def step_fn(params, x_last, kv_cache, mods_last, valid):
        return dit_apply_step(params, cfg, x_last, kv_cache, mods_last,
                              valid, compute_dtype)

    return prefill_fn, step_fn


def unstack_for_inference(params, cfg: DiTConfig):
    """Convert the stacked `blocks` pytree into a tuple of per-block pytrees.

    dit_apply then runs a Python loop over separate weight arrays,
    eliminating the scan's per-block weight slice copies (see the fast-path
    comment in dit_apply). Do this OUTSIDE any jit, once (after
    cast_params_for_inference when serving). Round 3: the layout also wins
    for TRAINING — the scan's stacked-grad dynamic-update-slice accumulation
    and weight slicing cost ~45 ms of a 246 ms step at flagship B=8
    (docs/PERF.md round-3 profile; config key `unstack_train`); grads and
    optax updates flow through the tuple-of-dicts layout unchanged.

    No-op if already unstacked (unstack_train checkpoints/params)."""
    if isinstance(params.get("blocks"), (tuple, list)):
        assert len(params["blocks"]) == cfg.depth, (
            len(params["blocks"]), cfg.depth)
        return params
    out = dict(params)
    out["blocks"] = tuple(
        jax.tree.map(lambda a, i=i: a[i], params["blocks"])
        for i in range(cfg.depth)
    )
    return out


def restack_params(params, cfg: DiTConfig):
    """Inverse of unstack_for_inference: tuple of per-block pytrees back to
    the stacked (depth, ...) layout (safetensors export, layout-agnostic
    checkpoint interchange). No-op if already stacked."""
    if not isinstance(params.get("blocks"), (tuple, list)):
        return params
    out = dict(params)
    blocks = params["blocks"]
    assert len(blocks) == cfg.depth, (len(blocks), cfg.depth)
    out["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return out


def quantize_for_inference(params, cfg: DiTConfig, adaln: bool = True):
    """W8A8 serving: int8-quantize every block's per-token GEMM kernels
    (qkv/out/fc1/fc2 of both halves — symmetric per-output-channel, scales
    kept fp32). The quantized blocks dispatch to the int8 Pallas kernels in
    gtax.kernels.quant (_block_apply detects the "kernel_q" leaves); the MXU
    runs int8 at 2x bf16 on v5e and weight streaming halves. With adaln=True
    (default) the per-block adaLN heads also quantize — they are
    FLOP-negligible (5 conditioning rows) but carry a third of the block
    weight bytes, and run via the int8 path of gtax.nn.layers.linear.
    Patch/timestep embedders and the final layer stay in the compute dtype —
    they are a small fraction of FLOPs and bytes.

    Apply AFTER cast_params_for_inference and either before or after
    unstack_for_inference (stacked (L, din, dout) kernels quantize with
    per-block scales). Inference-only: the quantized pytree is not trainable
    and not exportable; keep the original params for checkpointing."""
    from gtax.kernels.quant import quantize_weight

    def qlin(d):
        q, s = quantize_weight(d["kernel"])
        nd = {"kernel_q": q, "scale": s}
        if "bias" in d:
            nd["bias"] = d["bias"]
        return nd

    def qblock(bp):
        nbp = {k: (dict(v) if isinstance(v, dict) else v)
               for k, v in bp.items()}
        for attn_k in ("s_attn", "t_attn"):
            nbp[attn_k]["qkv"] = qlin(bp[attn_k]["qkv"])
            nbp[attn_k]["out"] = qlin(bp[attn_k]["out"])
        for mlp_k in ("s_mlp", "t_mlp"):
            nbp[mlp_k]["fc1"] = qlin(bp[mlp_k]["fc1"])
            nbp[mlp_k]["fc2"] = qlin(bp[mlp_k]["fc2"])
        if adaln:
            nbp["s_adaln"] = qlin(bp["s_adaln"])
            nbp["t_adaln"] = qlin(bp["t_adaln"])
        return nbp

    out = dict(params)
    blocks = params["blocks"]
    if isinstance(blocks, (list, tuple)):
        out["blocks"] = tuple(qblock(bp) for bp in blocks)
    else:
        out["blocks"] = qblock(blocks)
    return out


def cast_params_for_inference(params, dtype=jnp.bfloat16):
    """Pre-cast weights to the compute dtype ONCE for serving.

    At B=1 the DiT forward is weight-bandwidth-bound; reading fp32 masters and
    casting per call doubles HBM traffic. Rotary frequency tables stay fp32 —
    their rotation math is fp32 by contract (gtax.core.rope) and bf16 storage
    would corrupt high-frequency phases.
    """

    def cast(path, leaf):
        keys = {str(getattr(p, "key", p)) for p in path}
        if keys & {"spatial_rope_freqs", "temporal_rope_freqs"}:
            return leaf
        return leaf.astype(dtype) if jnp.issubdtype(leaf.dtype, jnp.floating) else leaf

    return jax.tree_util.tree_map_with_path(cast, params)


def DiT_S_2() -> DiTConfig:
    """Flagship config — ~0.67B params (reference model/dit.py:379-389).
    external_cond_dim stays 25 even for the action-free model, matching the
    shipped checkpoints (ref quirk at dit.py:388)."""
    return DiTConfig(
        input_h=18,
        input_w=32,
        patch_size=2,
        hidden_size=1024,
        depth=16,
        num_heads=16,
        max_frames=5,
        external_cond_dim=25,
    )


def DiT_debug() -> DiTConfig:
    """Tiny preset for smoke runs on any hardware (pairs with the VAE
    'vae-debug' preset: latent 8ch on a 6x8 grid). The reference hard-codes
    model shapes in factories (model/dit.py:379-389); gtax keeps the registry
    but adds a debug entry so the full train/generate CLI surface is drivable
    without checkpoints or a large chip."""
    return DiTConfig(
        input_h=6,
        input_w=8,
        patch_size=2,
        in_channels=8,
        hidden_size=64,
        depth=2,
        num_heads=2,
        max_frames=5,
        external_cond_dim=25,
    )


DiT_MODELS = {"DiT-S/2": DiT_S_2, "DiT-debug": DiT_debug}
