"""Whole-DiT-stack weight-streaming pipeline: the 16-block spatiotemporal
stack as ONE Pallas kernel.

Replaces the per-branch fused kernels (gtax.kernels.block) on the B=1
inference hot path (reference workload: generate.py rollout,
/root/reference/generate.py:200-235). Motivation, from the v5e profile of the
per-branch path (docs/PERF.md):

  - XLA's scan dynamic-slices stacked weights into HBM->HBM copies for every
    custom-call operand (~1.2 ms/forward) — a Pallas kernel can't consume a
    fused slice;
  - per-branch kernels stall on their weight DMA at kernel start (a
    scalar-prefetch variant proved removing the copies alone is a wash: the
    DMA serialises into the kernel instead);
  - x round-trips HBM between branches (4x 3 MB per block).

Here the grid is (depth, 4 stages); the activation x lives in a VMEM scratch
buffer across ALL grid steps, per-stage weights arrive as packed,
uniformly-shaped blocks whose DMA the Pallas pipeline overlaps with the
previous stage's compute, and no activation bytes cross HBM between the
initial x and the final output. Weight bytes stream HBM->VMEM exactly once
per forward — the roofline for this model (1.2 GB bf16 @ 819 GB/s ~ 1.5 ms),
overlapped against ~3 ms of MXU compute.

Stages per block (matching SpatioTemporalDiTBlock, reference
model/dit.py:200-225): 0 = spatial attention branch, 1 = spatial MLP,
2 = temporal causal attention, 3 = temporal MLP. Branch math is identical to
gtax.kernels.block (LN/modulate/softmax/accumulations in fp32, rope as
signed-permutation matmuls, temporal scores as head-indicator segment sums);
adaLN head outputs are precomputed per forward in XLA (bandwidth-bound tiny
GEMMs) and expanded to token rows in-kernel by a free frame-major
(F, S, D) view + broadcast.

Forward-only (no custom_vjp): selected by DiTConfig.stream_stacked for
inference; training uses the trainable per-branch path (gtax.nn.branches).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gtax.kernels.attention import interpret_mode
from gtax.kernels.block import (_rope_rotate, _rows_from_frames,
                                rotate_half_matrix, temporal_preamble)

_STACK_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("arbitrary", "arbitrary"),
    vmem_limit_bytes=112 * 1024 * 1024,
)

# sideband fp32 block (1, 32, Hmax) row layout:
_ROWS_SHIFT = 0   # rows 0:8   shift vectors (cols :D), frame-major
_ROWS_SCALE = 8   # rows 8:16  scale vectors
_ROWS_GATE = 16   # rows 16:24 gate vectors
_ROW_BIAS1 = 24   # attn: out-proj bias (cols :D); mlp: fc1 bias (cols :H)
_ROW_BIAS2 = 25   # mlp: fc2 bias (cols :D)


def _stack_kernel(x_ref, adaln_ref, attn_hbm, mlp_hbm, spcos_ref,
                  spsin_ref, spR_ref, tcos_ref, tsin_ref, tR_ref, tseg_ref,
                  tbias_ref, o_ref, xs_ref, attn_buf, mlp_buf, attn_sem,
                  mlp_sem, *, depth, num_heads, n_batches, n_frames, seq_len,
                  ln_eps, mod_eps, approx_gelu):
    b = pl.program_id(0)
    s = pl.program_id(1)
    D = xs_ref.shape[-1]
    S = seq_len
    T = n_frames
    F = n_batches * n_frames  # frames = rows // S
    d = D // num_heads
    dt = xs_ref.dtype

    # ---- manual double-buffered weight streaming -------------------------
    # Stages alternate attn (s even) / mlp (s odd), so ONE VMEM buffer per
    # kind suffices: while an attn stage computes, the next mlp slice is in
    # flight, and vice versa. The BlockSpec auto-pipeline measured NO overlap
    # for these large packs (stub-kernel experiment: full-compute minus
    # stub-compute exceeded the branch FLOP time by the full DMA time), so
    # the copies are issued explicitly one stage ahead.
    step = 4 * b + s  # linear step, 0 .. 4*depth-1
    n_steps = 4 * depth

    @pl.when(step == 0)
    def _first_fetch():
        pltpu.make_async_copy(attn_hbm.at[0], attn_buf, attn_sem).start()

    @pl.when(jnp.logical_and(b == 0, s == 0))
    def _seed():
        xs_ref[:] = x_ref[:]

    x32 = xs_ref[:].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    ln = (x32 - mean) * jax.lax.rsqrt(var + ln_eps)

    # expand per-frame adaLN vectors to token rows: rows are frame-contiguous
    # and S is a sublane multiple, so a (F, S, D) view + second-minor
    # broadcast is free (an E-matmul version of this expansion ran at ~6% MXU
    # efficiency — K=8 — and cost ~0.7 ms/forward)
    vecs = adaln_ref[0]  # (32, Hmax) f32
    shift = vecs[_ROWS_SHIFT:_ROWS_SHIFT + F, :D][:, None, :]  # (F, 1, D)
    scale = vecs[_ROWS_SCALE:_ROWS_SCALE + F, :D][:, None, :]
    gate = vecs[_ROWS_GATE:_ROWS_GATE + F, :D][:, None, :]
    ln3 = ln.reshape(F, S, D)
    mod = (ln3 * (1.0 + scale + mod_eps) + shift).reshape(F * S, D).astype(dt)
    scale_attn = 1.0 / (d**0.5)

    def residual(y):
        y3 = y.reshape(F, S, D) * gate
        xs_ref[:] = (x32 + y3.reshape(F * S, D)).astype(dt)

    @pl.when(s == 0)
    def _spatial_attn():
        pltpu.make_async_copy(mlp_hbm.at[step // 2], mlp_buf, mlp_sem).start()
        pltpu.make_async_copy(attn_hbm.at[step // 2], attn_buf, attn_sem).wait()
        w = attn_buf[:]  # (D, 4D): [:, :3D]=qkv, [:, 3D:]=out
        qkv = jnp.dot(mod, w[:, :3 * D], preferred_element_type=jnp.float32)
        q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]
        cos = spcos_ref[:]  # (rows, d) f32
        sin = spsin_ref[:]
        R = spR_ref[:]      # (d, d)
        head_outs = []
        for h in range(num_heads):
            sl = slice(h * d, (h + 1) * d)
            qs32, ks32 = q[:, sl], k[:, sl]
            qs = (qs32 * cos + jnp.dot(
                qs32, R, preferred_element_type=jnp.float32) * sin).astype(dt)
            ks = (ks32 * cos + jnp.dot(
                ks32, R, preferred_element_type=jnp.float32) * sin).astype(dt)
            vs = v[:, sl].astype(dt)
            # frames as a BATCH dim of one dot_general (free (F, S, d) view —
            # S is a sublane multiple): 2 MXU ops per head instead of 2F
            q3 = qs.reshape(F, S, d)
            k3 = ks.reshape(F, S, d)
            v3 = vs.reshape(F, S, d)
            scores = jax.lax.dot_general(
                q3, k3, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale_attn
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
            o3 = jax.lax.dot_general(
                probs, v3, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            head_outs.append(o3.reshape(F * S, d))
        attn_out = jnp.concatenate(head_outs, axis=-1).astype(dt)
        y = jnp.dot(attn_out, w[:, 3 * D:],
                    preferred_element_type=jnp.float32)
        residual(y + vecs[_ROW_BIAS1, :D])

    @pl.when(s == 2)
    def _temporal_attn():
        pltpu.make_async_copy(mlp_hbm.at[step // 2], mlp_buf, mlp_sem).start()
        pltpu.make_async_copy(attn_hbm.at[step // 2], attn_buf, attn_sem).wait()
        w = attn_buf[:]
        qkv = jnp.dot(mod, w[:, :3 * D], preferred_element_type=jnp.float32)
        q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]
        cos = _rows_from_frames(tcos_ref[:], S)  # (F, D) -> (rows, D) f32
        sin = _rows_from_frames(tsin_ref[:], S)
        R = tR_ref[:]      # (d, d) per-head rotate-half permutation
        seg = tseg_ref[:]  # (D, h)
        qr = _rope_rotate(q, cos, sin, R).astype(dt)
        kr = _rope_rotate(k, cos, sin, R).astype(dt)
        vv = v.astype(dt)
        out_rows = []
        for bb in range(n_batches):
            base = bb * T * S

            def frame(t, arr):
                return arr[base + t * S: base + (t + 1) * S]

            scores = [[None] * T for _ in range(T)]
            for i in range(T):
                qi = frame(i, qr)
                for j in range(i + 1):
                    kj = frame(j, kr)
                    scores[i][j] = jnp.dot(
                        (qi * kj).astype(dt), seg,
                        preferred_element_type=jnp.float32,
                    ) * scale_attn + tbias_ref[i, j]
            for i in range(T):
                row = [scores[i][j] for j in range(i + 1)]
                m = row[0]
                for s_ij in row[1:]:
                    m = jnp.maximum(m, s_ij)
                exps = [jnp.exp(s_ij - m) for s_ij in row]
                denom = exps[0]
                for e in exps[1:]:
                    denom = denom + e
                acc = None
                for j, e in enumerate(exps):
                    probs = (e / denom).astype(dt)
                    pexp = jnp.dot(
                        probs, seg.T, preferred_element_type=jnp.float32,
                    ).astype(dt)
                    term = pexp * frame(j, vv)
                    acc = term if acc is None else acc + term
                out_rows.append(acc)
        attn_out = jnp.concatenate(out_rows, axis=0).astype(dt)
        y = jnp.dot(attn_out, w[:, 3 * D:],
                    preferred_element_type=jnp.float32)
        residual(y + vecs[_ROW_BIAS1, :D])

    @pl.when(jnp.logical_or(s == 1, s == 3))
    def _mlp():
        @pl.when(step + 1 < n_steps)
        def _prefetch_attn():
            pltpu.make_async_copy(
                attn_hbm.at[(step + 1) // 2], attn_buf, attn_sem).start()

        pltpu.make_async_copy(
            mlp_hbm.at[(step - 1) // 2], mlp_buf, mlp_sem).wait()
        w = mlp_buf[:]  # (2D, H): [:D]=fc1, [D:]=fc2^T
        H = w.shape[-1]
        h = jnp.dot(mod, w[:D], preferred_element_type=jnp.float32)
        h = h + vecs[_ROW_BIAS1, :H]
        h = jax.nn.gelu(h, approximate=approx_gelu).astype(dt)
        y = jax.lax.dot_general(
            h, w[D:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        residual(y + vecs[_ROW_BIAS2, :D])

    @pl.when(jnp.logical_and(b == depth - 1, s == 3))
    def _emit():
        o_ref[:] = xs_ref[:]


def pack_stack_weights(blocks, dtype):
    """XLA-side packing of the stacked block params into the megakernel's
    uniform per-stage tensors. A pure function of the weights — inside a
    rollout jit it is loop-invariant and hoisted out of the denoise scan.

    Returns attn_pack (2L, D, 4D) dtype (index 2b = block b spatial,
    2b+1 = temporal; [:, :, :3D] qkv, [:, :, 3D:] out-proj) and
    mlp_pack (2L, 2D, H) dtype ([:, :D] fc1, [:, D:] fc2 transposed)."""
    qkv_s = blocks["s_attn"]["qkv"]["kernel"].astype(dtype)   # (L, D, 3D)
    out_s = blocks["s_attn"]["out"]["kernel"].astype(dtype)   # (L, D, D)
    qkv_t = blocks["t_attn"]["qkv"]["kernel"].astype(dtype)
    out_t = blocks["t_attn"]["out"]["kernel"].astype(dtype)
    L, D, _ = qkv_s.shape
    attn_s = jnp.concatenate([qkv_s, out_s], axis=-1)          # (L, D, 4D)
    attn_t = jnp.concatenate([qkv_t, out_t], axis=-1)
    attn_pack = jnp.stack([attn_s, attn_t], axis=1).reshape(2 * L, D, 4 * D)

    w1_s = blocks["s_mlp"]["fc1"]["kernel"].astype(dtype)      # (L, D, H)
    w2_s = blocks["s_mlp"]["fc2"]["kernel"].astype(dtype)      # (L, H, D)
    w1_t = blocks["t_mlp"]["fc1"]["kernel"].astype(dtype)
    w2_t = blocks["t_mlp"]["fc2"]["kernel"].astype(dtype)
    H = w1_s.shape[-1]
    mlp_s = jnp.concatenate([w1_s, jnp.swapaxes(w2_s, 1, 2)], axis=1)
    mlp_t = jnp.concatenate([w1_t, jnp.swapaxes(w2_t, 1, 2)], axis=1)
    mlp_pack = jnp.stack([mlp_s, mlp_t], axis=1).reshape(2 * L, 2 * D, H)
    return attn_pack, mlp_pack


def pack_stack_sideband(blocks, c, dtype):
    """Per-forward fp32 sideband: adaLN shift/scale/gate vectors for every
    (block, stage) plus branch biases, in the (4L, 32, Hmax) row layout
    (_ROWS_* above).

    c: (BT, D) conditioning, BT <= 8. adaLN math matches
    gtax.nn.layers.adaln bit-for-bit: silu in fp32, linear in `dtype` with
    fp32 accumulation + fp32 bias, output rounded to `dtype`."""
    from gtax.nn.layers import matmul_precision

    L = blocks["s_adaln"]["kernel"].shape[0]
    D = c.shape[-1]
    H = blocks["s_mlp"]["fc1"]["bias"].shape[-1]
    BT = c.shape[0]
    if BT > 8:
        raise ValueError("stack sideband supports B*T <= 8")
    Hmax = max(H, D)
    h = jax.nn.silu(c.astype(jnp.float32)).astype(dtype)

    def block_rows(adaln_prms, bias1, mlp_biases):
        out = jnp.einsum(
            "bd,ldh->lbh", h, adaln_prms["kernel"].astype(dtype),
            preferred_element_type=jnp.float32,
            precision=matmul_precision(jnp.dtype(dtype)),
        ) + adaln_prms["bias"][:, None, :]
        out = out.astype(dtype).astype(jnp.float32)  # adaln() rounds to dtype
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(out, 6, axis=-1)

        def side(sh, sc, g, b1, b2):
            rows = jnp.zeros((L, 32, Hmax), jnp.float32)
            pad = [(0, 0), (0, 8 - BT), (0, Hmax - D)]
            rows = rows.at[:, _ROWS_SHIFT:_ROWS_SHIFT + 8].set(
                jnp.pad(sh, pad))
            rows = rows.at[:, _ROWS_SCALE:_ROWS_SCALE + 8].set(
                jnp.pad(sc, pad))
            rows = rows.at[:, _ROWS_GATE:_ROWS_GATE + 8].set(jnp.pad(g, pad))
            b1r = jnp.broadcast_to(b1, (L, b1.shape[-1])) \
                if b1.ndim == 2 else b1
            rows = rows.at[:, _ROW_BIAS1, :b1.shape[-1]].set(b1r)
            if b2 is not None:
                rows = rows.at[:, _ROW_BIAS2, :b2.shape[-1]].set(b2)
            return rows

        attn_rows = side(sh1, sc1, g1, bias1, None)
        mlp_rows = side(sh2, sc2, g2, *mlp_biases)
        return attn_rows, mlp_rows

    s_attn_rows, s_mlp_rows = block_rows(
        blocks["s_adaln"], blocks["s_attn"]["out"]["bias"],
        (blocks["s_mlp"]["fc1"]["bias"], blocks["s_mlp"]["fc2"]["bias"]),
    )
    t_attn_rows, t_mlp_rows = block_rows(
        blocks["t_adaln"], blocks["t_attn"]["out"]["bias"],
        (blocks["t_mlp"]["fc1"]["bias"], blocks["t_mlp"]["fc2"]["bias"]),
    )
    side = jnp.stack([s_attn_rows, s_mlp_rows, t_attn_rows, t_mlp_rows],
                     axis=1)  # stage order: s_attn, s_mlp, t_attn, t_mlp
    return side.reshape(4 * L, 32, Hmax)


@functools.partial(
    jax.jit,
    static_argnames=("depth", "num_heads", "n_batches", "n_frames",
                     "approx_gelu"),
)
def fused_dit_stack(x, attn_pack, mlp_pack, sideband, spatial_freqs,
                    temporal_freqs, valid, depth, num_heads, n_batches,
                    n_frames, approx_gelu=True):
    """Run the full block stack over token rows x: (rows = B*T*S, D).

    spatial_freqs: (S, d) pixel-axial angle table; temporal_freqs: (T, d)
    table; valid: (T,) bool or None."""
    rows, D = x.shape
    B, T = n_batches, n_frames
    S = rows // (B * T)
    d = D // num_heads
    H = mlp_pack.shape[-1]
    dt = x.dtype

    spcos = jnp.tile(jnp.cos(spatial_freqs.astype(jnp.float32)), (B * T, 1))
    spsin = jnp.tile(jnp.sin(spatial_freqs.astype(jnp.float32)), (B * T, 1))
    spR = jnp.asarray(rotate_half_matrix(d))

    tcos, tsin, tR, tseg, tbias = temporal_preamble(
        temporal_freqs, valid, B, S, T, num_heads, d, dt
    )

    def full(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda b, s, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _stack_kernel, depth=depth, num_heads=num_heads, n_batches=B,
            n_frames=T, seq_len=S, ln_eps=1e-6, mod_eps=1e-6,
            approx_gelu=approx_gelu,
        ),
        grid=(depth, 4),
        in_specs=[
            full(x),
            pl.BlockSpec((1, 32, sideband.shape[-1]),
                         lambda b, s: (4 * b + s, 0, 0),
                         memory_space=pltpu.VMEM),
            # weight packs stay in HBM; the kernel streams each (block,
            # stage) slice with explicit async copies one stage ahead
            pl.BlockSpec(memory_space=pl.ANY),      # attn_pack
            pl.BlockSpec(memory_space=pl.ANY),      # mlp_pack
            full(spcos), full(spsin), full(spR),
            full(tcos), full(tsin), full(tR), full(tseg),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tbias (T, T)
        ],
        out_specs=full(x),
        out_shape=jax.ShapeDtypeStruct(x.shape, dt),
        scratch_shapes=[
            pltpu.VMEM((rows, D), dt),        # xs: resident activation
            pltpu.VMEM((D, 4 * D), dt),       # attn weight buffer
            pltpu.VMEM((2 * D, H), dt),       # mlp weight buffer
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret_mode(),
        compiler_params=_STACK_PARAMS,
    )(x, sideband, attn_pack, mlp_pack, spcos, spsin, spR, tcos, tsin,
      tR, tseg, tbias)
    return out
