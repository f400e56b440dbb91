"""Round-5 serving-kernel experiments: change the WORK, not the schedule.

The round-4 ablation (scripts/b8_ablation.py) proved the B=8 scheduling
hypotheses dead; VERDICT r4 #1 names three structures to break by layout or
numerics instead:

  (a) MLP: fold gelu+requant into the fc1 epilogue — the dynamic-int8
      hidden requant runs gelu -> materialize -> abs/amax -> scale/round as
      THREE full-array VPU stages per chunk. Variants:
        nc sweep      — 8 chunks was tuned for B=1 weight-DMA pipelining;
                        at B=8 the fc2 fp32-accumulator RMW scales with nc
        bound epilogue— per-row quant scale from the SIGNED max of the
                        pre-gelu activation h: sup|gelu(row)| ==
                        max(gelu(max(row)), 0.17004) exactly (gelu is
                        monotone above -0.7518 and |gelu| <= 0.17004 below),
                        so the gelu output is produced and consumed in ONE
                        fused scale/round stage — no second materialised
                        array, no abs/amax pass over it
        pade          — tanh via a clamped Pade(3,2) rational (max err
                        ~5e-3, under the 1/127 int8 step) — probes whether
                        the hardware tanh is a VPU bottleneck
  (b) Spatial attention: per-head frame-batched dots leave ~26 us/call of
      per-dot MXU issue overhead (32 dots/call at B=8). Variant hf packs
      heads AND frames into ONE 3D dot pair via a lane-slice relayout
      (16 sublane-concats of (F*S, 64) head slices; ~9 MB extra traffic vs
      32 fewer dispatches).
  (c) Temporal step: drop the bf16 cast of the probs re-expand (nocast) and
      re-check the per-pair expand (perpair) in the shipped BATCH-TILED
      form; sweep batch_tile at B=8/16 under the 121 MB VMEM budget
      (the B=16-flatness probe, VERDICT r4 weak #1).

Usage: python scripts/r5_serving_exp.py --family mlp|spatial|temporal|scale
         [--calls 100] [--batch 8] [--variants a,b,c]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gtax.utils.platform import enable_compile_cache, honor_env_platform

honor_env_platform()
enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gtax.core import rope
from gtax.kernels.attention import interpret_mode
from gtax.kernels.block import (
    _ln_modulate32,
    _rotate_half_lanes,
    _rows_from_frames,
    temporal_preamble,
)
from gtax.kernels.quant import (
    _qdot,
    _quant_rows,
    fused_mlp_branch_q,
    fused_temporal_step_q,
    quantize_weight,
)

S, D, HEADS, HID, N_CTX = 144, 1024, 16, 4096, 4
_GELU_C = 0.7978845608028654  # sqrt(2/pi)
_GELU_A = 0.044715
_GELU_MIN = 0.17004  # sup |gelu(x)| over x <= -0.7518 (attained at -0.7518)


def _tanh_pade(u):
    """Clamped Pade(3,2) tanh: u(27+u^2)/(27+9u^2), max |err| ~5e-3 before
    the clamp takes over (|u|>~3) — below the int8 quantisation step."""
    u2 = u * u
    t = u * (27.0 + u2) / (27.0 + 9.0 * u2)
    return jnp.clip(t, -1.0, 1.0)


def _gelu_tanh(h, tanh_fn=jnp.tanh):
    u = _GELU_C * (h + _GELU_A * h * h * h)
    return 0.5 * h * (1.0 + tanh_fn(u))


def _mlp_exp_kernel(x_ref, shift_ref, scale_ref, gate_ref, w1q_ref, w1s_ref,
                    b1_ref, w2q_ref, w2s_ref, b2_ref, o_ref, qmod_ref,
                    qs_ref, acc_ref, *, seq_len, n_chunks, epilogue):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        _, mod = _ln_modulate32(x_ref, shift_ref, scale_ref, 1e-6, 1e-6,
                                seq_len)
        q, s = _quant_rows(mod)
        qmod_ref[:] = q
        qs_ref[:] = s
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc1 = jax.lax.dot_general(
        qmod_ref[:], w1q_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = (acc1.astype(jnp.float32) * qs_ref[:] * w1s_ref[:]
         + b1_ref[0].astype(jnp.float32))
    if epilogue == "dyn":
        g = jax.nn.gelu(h, approximate=True)
        hq, hs = _quant_rows(g)
    else:
        tanh_fn = _tanh_pade if epilogue == "pade" else jnp.tanh
        mx = jnp.max(h, axis=-1, keepdims=True)
        hs = jnp.maximum(_gelu_tanh(mx, tanh_fn), _GELU_MIN) * (1.0 / 127.0)
        hq = jnp.round(_gelu_tanh(h, tanh_fn) * (1.0 / hs)).astype(jnp.int8)
    part = jax.lax.dot_general(
        hq, w2q_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    if n_chunks == 1:
        acc_ref[:] = part.astype(jnp.float32) * hs
    else:
        acc_ref[:] += part.astype(jnp.float32) * hs

    @pl.when(c == n_chunks - 1)
    def _():
        x32 = x_ref[:].astype(jnp.float32)
        y = acc_ref[:] * w2s_ref[:] + b2_ref[0].astype(jnp.float32)
        g = _rows_from_frames(gate_ref[:].astype(jnp.float32), seq_len,
                              x32.shape[0])
        o_ref[:] = (x32 + g * y).astype(o_ref.dtype)


def build_mlp(N, nc, epilogue, w):
    hc = HID // nc
    w1q, w1s, b1, w2q, w2s, b2, sh, sc, g = w

    @jax.jit
    def call(x):
        xf = x.reshape(N * S, D)
        row = pl.BlockSpec((N * S, D), lambda c: (0, 0),
                           memory_space=pltpu.VMEM)
        frame = pl.BlockSpec((N, D), lambda c: (0, 0),
                             memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(
                _mlp_exp_kernel, seq_len=S, n_chunks=nc, epilogue=epilogue),
            out_shape=jax.ShapeDtypeStruct(xf.shape, xf.dtype),
            grid=(nc,),
            in_specs=[
                row, frame, frame, frame,
                pl.BlockSpec((D, hc), lambda c: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hc), lambda c: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hc), lambda c: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hc, D), lambda c: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda c: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda c: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=row,
            scratch_shapes=[
                pltpu.VMEM((N * S, D), jnp.int8),
                pltpu.VMEM((N * S, 1), jnp.float32),
                pltpu.VMEM((N * S, D), jnp.float32),
            ],
            interpret=interpret_mode(),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(xf, sh, sc, g, w1q, w1s.reshape(1, -1), b1.reshape(1, -1),
          w2q, w2s.reshape(1, -1), b2.reshape(1, -1))
        return out.reshape(N, S, D)

    return call


def _spatial_exp_kernel(x_ref, shift_ref, scale_ref, gate_ref, qkvq_ref,
                        qkvs_ref, outq_ref, outs_ref, outb_ref, cos_ref,
                        sin_ref, o_ref, *, num_heads, n_frames, seq_len,
                        layout):
    x = x_ref[:]
    NS, Dd = x.shape
    d = Dd // num_heads
    F = n_frames
    x32, mod = _ln_modulate32(x_ref, shift_ref, scale_ref, 1e-6, 1e-6,
                              seq_len)
    qkv = _qdot(mod, qkvq_ref, qkvs_ref)
    q, k, v = qkv[:, :Dd], qkv[:, Dd:2 * Dd], qkv[:, 2 * Dd:]
    scale_attn = 1.0 / (d**0.5)
    cosD, sinD = cos_ref[:], sin_ref[:]
    qr = (q * cosD + _rotate_half_lanes(q) * sinD).astype(x.dtype)
    kr = (k * cosD + _rotate_half_lanes(k) * sinD).astype(x.dtype)
    vb = v.astype(x.dtype)

    if layout == "base":  # shipped: per-head frame-batched 3D dots
        score_blocks = []
        for h in range(num_heads):
            sl = slice(h * d, (h + 1) * d)
            q3 = qr[:, sl].reshape(F, S, d)
            k3 = kr[:, sl].reshape(F, S, d)
            s3 = jax.lax.dot_general(
                q3, k3, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale_attn
            score_blocks.append(s3.reshape(F * S, S))
        scores = jnp.concatenate(score_blocks, axis=0)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        head_outs = []
        for h in range(num_heads):
            v3 = vb[:, h * d:(h + 1) * d].reshape(F, S, d)
            p3 = probs[h * F * S:(h + 1) * F * S].reshape(F, S, S)
            o3 = jax.lax.dot_general(
                p3, v3, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            head_outs.append(o3.reshape(F * S, d))
        attn_out = jnp.concatenate(head_outs, axis=-1)
    else:  # hf: heads AND frames in ONE batched dot via sublane relayout
        # Mosaic can only sublane-concat lane slices whose in-register lane
        # offset is 0 mod the 128-lane tile: even heads slice directly
        # (offset 64h = 0 mod 128), odd heads come from ONE full-width
        # 64-lane roll that shifts them onto aligned offsets.
        def head_stack(a):
            # tpu.rotate is 32-bit only: roll the fp32 value, cast after
            a32 = a.astype(jnp.float32)
            a_odd = pltpu.roll(a32, shift=Dd - d, axis=1)
            slabs = [
                a32[:, h * d:(h + 1) * d] if h % 2 == 0
                else a_odd[:, (h - 1) * d:h * d]
                for h in range(num_heads)
            ]
            return jnp.concatenate(slabs, axis=0).reshape(
                num_heads * F, S, d).astype(a.dtype)

        q4 = head_stack(qr)
        k4 = head_stack(kr)
        v4 = head_stack(vb)
        s4 = jax.lax.dot_general(
            q4, k4, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale_attn
        scores = s4.reshape(num_heads * F * S, S)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        p4 = probs.reshape(num_heads * F, S, S)
        o4 = jax.lax.dot_general(
            p4, v4, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ocat = o4.reshape(num_heads * F * S, d)
        # inverse: two-level lane concat — 64-wide aligned pieces pair up
        # to 128-wide tiles, which then concat at 128-aligned offsets
        heads = [ocat[h * F * S:(h + 1) * F * S] for h in range(num_heads)]
        pairs = [jnp.concatenate(heads[j:j + 2], axis=-1)
                 for j in range(0, num_heads, 2)]
        attn_out = jnp.concatenate(pairs, axis=-1)

    y = _qdot(attn_out, outq_ref, outs_ref)
    y = y + outb_ref[0].astype(jnp.float32)
    g = _rows_from_frames(gate_ref[:].astype(jnp.float32), seq_len,
                          x32.shape[0])
    o_ref[:] = (x32 + g * y).astype(o_ref.dtype)


def build_spatial(N, layout, w):
    qkv_q, qkv_s, out_q, out_s, out_b, cosD, sinD, sh, sc, g = w
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    @jax.jit
    def call(x):
        return pl.pallas_call(
            functools.partial(
                _spatial_exp_kernel, num_heads=HEADS, n_frames=N, seq_len=S,
                layout=layout),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[full] * 11,
            out_specs=full,
            interpret=interpret_mode(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, sh, sc, g, qkv_q, qkv_s.reshape(1, -1), out_q,
          out_s.reshape(1, -1), out_b, cosD, sinD)

    return call


def _temporal_exp_kernel(x_ref, shift_ref, scale_ref, gate_ref, qkvq_ref,
                         qkvs_ref, outq_ref, outs_ref, outb_ref, kctx_ref,
                         vctx_ref, cos_ref, sin_ref, seg_ref, bias_ref,
                         o_ref, *, num_heads, n_ctx, seq_len, variant):
    """One batch element per tile (the shipped round-4 form), n_live=1."""
    x = x_ref[:]
    NS, Dd = x.shape
    d = Dd // num_heads
    x32, mod = _ln_modulate32(x_ref, shift_ref, scale_ref, 1e-6, 1e-6,
                              seq_len)
    qkv = _qdot(mod, qkvq_ref, qkvs_ref)
    q, k, v = qkv[:, :Dd], qkv[:, Dd:2 * Dd], qkv[:, 2 * Dd:]
    cos = _rows_from_frames(cos_ref[:], seq_len, NS)
    sin = _rows_from_frames(sin_ref[:], seq_len, NS)
    dt = x.dtype
    qr = (q * cos + _rotate_half_lanes(q) * sin).astype(dt)
    kr = (k * cos + _rotate_half_lanes(k) * sin).astype(dt)
    vb = v.astype(dt)
    kctx, vctx, seg = kctx_ref[:], vctx_ref[:], seg_ref[:]
    scale_attn = 1.0 / (d**0.5)
    P = n_ctx + 1
    slabs, slab_v = [], []
    for j in range(n_ctx):
        kj = kctx[j * seq_len:(j + 1) * seq_len]
        slabs.append(jnp.dot(
            (qr * kj).astype(dt), seg, preferred_element_type=jnp.float32,
        ) * scale_attn + bias_ref[n_ctx, j])
        slab_v.append(vctx[j * seq_len:(j + 1) * seq_len])
    slabs.append(jnp.dot(
        (qr * kr).astype(dt), seg, preferred_element_type=jnp.float32,
    ) * scale_attn + bias_ref[n_ctx, n_ctx])
    slab_v.append(vb)
    m = slabs[0]
    for s_ij in slabs[1:]:
        m = jnp.maximum(m, s_ij)
    exps = [jnp.exp(s_ij - m) for s_ij in slabs]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e

    if variant == "perpair":  # expand each pair's probs separately
        acc = None
        for j in range(P):
            pj = (exps[j] / denom).astype(dt)
            pexp = jnp.dot(pj, seg.T,
                           preferred_element_type=jnp.float32).astype(dt)
            term = pexp * slab_v[j]
            acc = term if acc is None else acc + term
        attn_out = acc.astype(jnp.float32)
    else:
        pcat = jnp.concatenate(
            [e / denom for e in exps], axis=0).astype(dt)
        pexp_cat = jnp.dot(pcat, seg.T, preferred_element_type=jnp.float32)
        if variant == "base":
            pexp_cat = pexp_cat.astype(dt)
        acc = None
        for j in range(P):
            pj = pexp_cat[j * seq_len:(j + 1) * seq_len]
            term = pj * slab_v[j]
            acc = term if acc is None else acc + term
        attn_out = acc.astype(jnp.float32)

    y = _qdot(attn_out, outq_ref, outs_ref)
    y = y + outb_ref[0].astype(jnp.float32)
    g = _rows_from_frames(gate_ref[:].astype(jnp.float32), seq_len, NS)
    o_ref[:] = (x32 + g * y).astype(o_ref.dtype)


def build_temporal(B, variant, w):
    (qkv_q, qkv_s, out_q, out_s, out_b, k_ctx, v_ctx, cos, sin, seg, bias,
     sh, sc, g) = w
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((S, D), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)
    ctx_spec = pl.BlockSpec((N_CTX * S, D), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)
    frame_spec = pl.BlockSpec((8, D), lambda t: (t, 0),
                              memory_space=pltpu.VMEM)

    @jax.jit
    def call(x):
        return pl.pallas_call(
            functools.partial(
                _temporal_exp_kernel, num_heads=HEADS, n_ctx=N_CTX,
                seq_len=S, variant=variant),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(B,),
            in_specs=[
                row_spec, frame_spec, frame_spec, frame_spec,
                full, full, full, full, full,
                ctx_spec, ctx_spec,
                frame_spec, frame_spec,
                full,
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=row_spec,
            interpret=interpret_mode(),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, sh, sc, g, qkv_q, qkv_s.reshape(1, -1), out_q,
          out_s.reshape(1, -1), out_b, k_ctx, v_ctx, cos, sin, seg, bias)

    return call


def time_chain_diff(call, x, calls):
    def make(length):
        @jax.jit
        def chain(x0):
            def body(c, _):
                return call(c), ()
            y, _ = jax.lax.scan(body, x0, None, length=length)
            return jnp.sum(y.astype(jnp.float32))
        return chain

    short, long_ = make(calls), make(4 * calls)
    float(short(x)), float(long_(x))
    ts, tl = [], []
    for _ in range(2):
        t0 = time.perf_counter(); float(short(x))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(long_(x))
        tl.append(time.perf_counter() - t0)
    return (min(tl) - min(ts)) / (3 * calls) * 1e6


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="mlp")
    p.add_argument("--calls", type=int, default=100)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--variants", default="")
    args = p.parse_args()
    wanted = set(v for v in args.variants.split(",") if v)
    B = args.batch
    N = B  # live frames (incremental serving: one per batch element)
    d = D // HEADS
    results = {}

    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    x2 = jax.random.normal(ks[0], (N * S, D), jnp.bfloat16)
    x3 = x2.reshape(N, S, D)
    sh = jax.random.normal(ks[1], (N, D), jnp.bfloat16)
    sc = jax.random.normal(ks[2], (N, D), jnp.bfloat16)
    g = jax.random.normal(ks[3], (N, D), jnp.bfloat16)

    def report(name, us, ref=None):
        results[name] = round(us, 1)
        extra = f"  ({us - ref:+.1f} vs base)" if ref is not None else ""
        print(f"{name:24s} {us:8.1f} us/call{extra}", flush=True)

    if args.family == "mlp":
        w1q, w1s = quantize_weight(jax.random.normal(ks[4], (D, HID)) * .02)
        w2q, w2s = quantize_weight(jax.random.normal(ks[5], (HID, D)) * .02)
        b1 = jnp.zeros((HID,), jnp.float32)
        b2 = jnp.zeros((D,), jnp.float32)
        w = (w1q, w1s, b1, w2q, w2s, b2, sh, sc, g)
        prod = lambda c: fused_mlp_branch_q(c, sh, sc, g, w1q, w1s, b1,
                                            w2q, w2s, b2)
        report("m_prod", time_chain_diff(prod, x3, args.calls))
        base_ref = None
        for nc in (8, 4, 2, 1):
            for epi in ("dyn", "bound", "pade"):
                name = f"m_{epi}_nc{nc}"
                if wanted and name not in wanted:
                    continue
                us = time_chain_diff(build_mlp(N, nc, epi, w), x3,
                                     args.calls)
                if name == "m_dyn_nc8":
                    base_ref = us
                report(name, us, base_ref if name != "m_dyn_nc8" else None)
        # numerics check of the bound epilogue vs dyn (fp32 host compare)
        a = np.asarray(build_mlp(N, 4, "dyn", w)(x3), np.float32)
        b = np.asarray(build_mlp(N, 4, "bound", w)(x3), np.float32)
        c = np.asarray(build_mlp(N, 4, "pade", w)(x3), np.float32)
        print("bound-vs-dyn max|d|:", float(np.abs(a - b).max()),
              " pade-vs-dyn max|d|:", float(np.abs(a - c).max()),
              " out rms:", float(np.sqrt((a * a).mean())), flush=True)

    if args.family == "spatial":
        qkv_q, qkv_s = quantize_weight(
            jax.random.normal(ks[4], (D, 3 * D)) * .02)
        out_q, out_s = quantize_weight(jax.random.normal(ks[5], (D, D)) * .02)
        out_b = jnp.zeros((1, D), jnp.float32)
        sp_freqs = rope.axial_freqs(
            rope.pixel_freqs(d // 2, 256.0), (9, 16), pixel=True
        ).reshape(S, -1)
        cos1 = jnp.tile(jnp.cos(sp_freqs.astype(jnp.float32)), (N, 1))
        sin1 = jnp.tile(jnp.sin(sp_freqs.astype(jnp.float32)), (N, 1))
        reps = D // cos1.shape[-1]
        cosD = jnp.concatenate([cos1] * reps, axis=-1)
        sinD = jnp.concatenate([sin1] * reps, axis=-1)
        w = (qkv_q, qkv_s, out_q, out_s, out_b, cosD, sinD, sh, sc, g)
        base = None
        for layout in ("base", "hf"):
            name = f"s_{layout}"
            if wanted and name not in wanted:
                continue
            us = time_chain_diff(build_spatial(N, layout, w), x2, args.calls)
            if layout == "base":
                base = us
            report(name, us, base if layout != "base" else None)
        a = np.asarray(build_spatial(N, "base", w)(x2), np.float32)
        b = np.asarray(build_spatial(N, "hf", w)(x2), np.float32)
        print("hf-vs-base max|d|:", float(np.abs(a - b).max()), flush=True)

    if args.family == "temporal":
        T = N_CTX + 1
        qkv_q, qkv_s = quantize_weight(
            jax.random.normal(ks[4], (D, 3 * D)) * .02)
        out_q, out_s = quantize_weight(jax.random.normal(ks[5], (D, D)) * .02)
        out_b = jnp.zeros((1, D), jnp.float32)
        t_freqs = rope.temporal_rope_freqs(jnp.arange(T), rope.lang_freqs(d))
        valid = jnp.ones((T,), bool)
        _, _, R, seg, bias = temporal_preamble(
            t_freqs, valid, B, S, T, HEADS, d, jnp.bfloat16)
        cos_t = jnp.cos(t_freqs.astype(jnp.float32))
        sin_t = jnp.sin(t_freqs.astype(jnp.float32))
        cos = jnp.tile(cos_t[N_CTX:T], (B, HEADS))
        sin = jnp.tile(sin_t[N_CTX:T], (B, HEADS))
        # pad per-frame vecs to 8 sublanes per tile (1 live frame/tile)
        def pad8(a):
            return jnp.pad(a.reshape(B, 1, D), ((0, 0), (0, 7), (0, 0))
                           ).reshape(B * 8, D)
        k_ctx = jax.random.normal(ks[8], (B * N_CTX * S, D), jnp.bfloat16)
        v_ctx = jax.random.normal(ks[9], (B * N_CTX * S, D), jnp.bfloat16)
        w = (qkv_q, qkv_s, out_q, out_s, out_b, k_ctx, v_ctx, pad8(cos),
             pad8(sin), seg, bias, pad8(sh), pad8(sc), pad8(g))
        base = None
        for variant in ("base", "nocast", "perpair"):
            name = f"t_{variant}"
            if wanted and name not in wanted:
                continue
            us = time_chain_diff(build_temporal(B, variant, w), x2,
                                 args.calls)
            if variant == "base":
                base = us
            report(name, us, base if variant != "base" else None)
        a = np.asarray(build_temporal(B, "base", w)(x2), np.float32)
        b = np.asarray(build_temporal(B, "nocast", w)(x2), np.float32)
        print("nocast-vs-base max|d|:", float(np.abs(a - b).max()),
              flush=True)

    if args.family == "scale":
        # production-kernel batch_tile sweep: the B=16-flatness probe
        T = N_CTX + 1
        qkv_q, qkv_s = quantize_weight(
            jax.random.normal(ks[4], (D, 3 * D)) * .02)
        out_q, out_s = quantize_weight(jax.random.normal(ks[5], (D, D)) * .02)
        out_b = jnp.zeros((D,), jnp.float32)
        t_freqs = rope.temporal_rope_freqs(jnp.arange(T), rope.lang_freqs(d))
        valid = jnp.ones((T,), bool)
        k_ctx = jax.random.normal(ks[8], (B * N_CTX * S, D), jnp.bfloat16)
        v_ctx = jax.random.normal(ks[9], (B * N_CTX * S, D), jnp.bfloat16)
        for bt in (1, 2, 4):
            if B % bt:
                continue
            name = f"ts_tile{bt}_B{B}"
            fn = lambda c, bt=bt: fused_temporal_step_q(
                c, sh, sc, g, qkv_q, qkv_s, out_q, out_s, out_b, k_ctx,
                v_ctx, t_freqs, valid, HEADS, N_CTX, batch_tile=bt)
            report(name, time_chain_diff(fn, x3, args.calls))

    print({"device": jax.devices()[0].device_kind, "B": B,
           "family": args.family, "us_per_call": results})


if __name__ == "__main__":
    main()
