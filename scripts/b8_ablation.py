"""Round-4 ablation of the int8 serving kernels at BATCHED shapes: where do
the ~43 us (spatial) / ~50 us (temporal step) per call above the int8-GEMM
floor go at B=8?

Experiment-only copies of the CURRENT kernel bodies (post lane-roll rope,
stacked softmax) with pieces switchable:

spatial_q variants:
  full        — the shipped kernel body
  no_softmax  — scores pass through (cast only): isolates the stacked
                max/exp/sum/div chain
  no_rope     — skip the full-width rope chain (cos/sin mul + lane rolls)
  no_dots     — rope + softmax run on a HOISTED dummy score slab; the 2*H*N
                small MXU dots removed: isolates score+PV dot cost
  no_attn     — attn_out = q: GEMMs + LN + quant only
  no_quant    — bf16 GEMMs instead of dynamic-int8 (quant + rescale removed;
                GEMM itself ~2x slower, so read the DELTA of deltas)

temporal_step_q variants:
  full / no_softmax / no_attn as above, plus
  no_reexpand — per-slab out terms use the (S, h) probs slab directly via a
                dummy broadcast instead of the (pairs*S, h) @ (h, D) seg.T
                re-expand dot + 23.6 MB fp32 materialisation
  no_scores   — constant score slabs (score dots removed)

Usage: python scripts/b8_ablation.py [--calls 100] [--batch 8]
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
    _BRANCH_PARAMS,
    _ln_modulate32,
    _rotate_half_lanes,
    _rows_from_frames,
    rotate_half_matrix,
    temporal_preamble,
)
from gtax.kernels.quant import _qdot, quantize_weight

S, D, HEADS, N_CTX = 144, 1024, 16, 4


def _spatial_abl(x_ref, shift_ref, scale_ref, gate_ref, qkvq_ref, qkvs_ref,
                 outq_ref, outs_ref, outb_ref, cos_ref, sin_ref, o_ref, *,
                 num_heads, n_frames, seq_len, flags):
    x = x_ref[:]
    NS, Dd = x.shape
    d = Dd // num_heads
    x32, mod = _ln_modulate32(x_ref, shift_ref, scale_ref, 1e-6, 1e-6,
                              seq_len)
    if flags["quant"]:
        qkv = _qdot(mod, qkvq_ref, qkvs_ref)
    else:
        qkv = jnp.dot(mod.astype(x.dtype), qkvq_ref[:].astype(x.dtype),
                      preferred_element_type=jnp.float32)
    q, k, v = qkv[:, :Dd], qkv[:, Dd:2 * Dd], qkv[:, 2 * Dd:]

    if not flags["attn"]:
        attn_out = q
    else:
        scale_attn = 1.0 / (d**0.5)
        if flags["rope"]:
            cosD, sinD = cos_ref[:], sin_ref[:]
            qr = (q * cosD + _rotate_half_lanes(q) * sinD).astype(x.dtype)
            kr = (k * cosD + _rotate_half_lanes(k) * sinD).astype(x.dtype)
        else:
            qr, kr = q.astype(x.dtype), k.astype(x.dtype)
        vb = v.astype(x.dtype)
        if flags.get("batched_dots"):
            # per-head BATCHED dot over frames: (F, S, d) x (F, S, d)
            # contracting d with batch dim F — 16+16 batched matmuls
            # instead of 256 small ones (tests Mosaic's batch-dim matmul)
            score_blocks = []
            for h in range(num_heads):
                sl = slice(h * d, (h + 1) * d)
                q3 = qr[:, sl].reshape(n_frames, seq_len, d)
                k3 = kr[:, sl].reshape(n_frames, seq_len, d)
                s3 = jax.lax.dot_general(
                    q3, k3, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * scale_attn
                score_blocks.append(
                    s3.reshape(n_frames * seq_len, seq_len))
            scores = jnp.concatenate(score_blocks, axis=0)
        elif flags["dots"]:
            score_blocks = []
            for h in range(num_heads):
                sl = slice(h * d, (h + 1) * d)
                qs, ks = qr[:, sl], kr[:, sl]
                for n in range(n_frames):
                    fr = slice(n * seq_len, (n + 1) * seq_len)
                    score_blocks.append(jax.lax.dot_general(
                        qs[fr], ks[fr], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * scale_attn)
            scores = jnp.concatenate(score_blocks, axis=0)
        else:
            # same-shape dummy slab built from q rows (keeps the softmax
            # work identical without the small dots)
            scores = jnp.concatenate(
                [qr[:, :seq_len].astype(jnp.float32)] * num_heads, axis=0)
        if flags["softmax"]:
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        else:
            probs = scores.astype(x.dtype)
        if flags.get("batched_dots"):
            head_outs = []
            for h in range(num_heads):
                v3 = vb[:, h * d:(h + 1) * d].reshape(n_frames, seq_len, d)
                p3 = probs[h * n_frames * seq_len:
                           (h + 1) * n_frames * seq_len].reshape(
                    n_frames, seq_len, seq_len)
                o3 = jax.lax.dot_general(
                    p3, v3, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                head_outs.append(o3.reshape(n_frames * seq_len, d))
            attn_out = jnp.concatenate(head_outs, axis=-1)
        elif flags["dots"]:
            head_outs = []
            for h in range(num_heads):
                vs = vb[:, h * d:(h + 1) * d]
                frame_outs = []
                for n in range(n_frames):
                    fr = slice(n * seq_len, (n + 1) * seq_len)
                    pr = (h * n_frames + n) * seq_len
                    frame_outs.append(jnp.dot(
                        probs[pr:pr + seq_len], vs[fr],
                        preferred_element_type=jnp.float32))
                head_outs.append(jnp.concatenate(frame_outs, axis=0))
            attn_out = jnp.concatenate(head_outs, axis=-1)
        else:
            attn_out = (probs[:NS].astype(jnp.float32)
                        @ jnp.zeros((seq_len, Dd), jnp.float32)) + q
    if flags["quant"]:
        y = _qdot(attn_out, outq_ref, outs_ref)
    else:
        y = jnp.dot(attn_out.astype(x.dtype), outq_ref[:].astype(x.dtype),
                    preferred_element_type=jnp.float32)
    y = y + outb_ref[0].astype(jnp.float32)
    g = _rows_from_frames(gate_ref[:].astype(jnp.float32), seq_len,
                          x32.shape[0])
    o_ref[:] = (x32 + g * y).astype(o_ref.dtype)


def _temporal_abl(x_ref, shift_ref, scale_ref, gate_ref, qkvq_ref, qkvs_ref,
                  outq_ref, outs_ref, outb_ref, kctx_ref, vctx_ref, cos_ref,
                  sin_ref, seg_ref, bias_ref, o_ref, *, num_heads, n_ctx,
                  n_batches, seq_len, flags):
    x = x_ref[:]
    NS, Dd = x.shape
    d = Dd // num_heads
    x32, mod = _ln_modulate32(x_ref, shift_ref, scale_ref, 1e-6, 1e-6,
                              seq_len)
    qkv = _qdot(mod, qkvq_ref, qkvs_ref)
    q, k, v = qkv[:, :Dd], qkv[:, Dd:2 * Dd], qkv[:, 2 * Dd:]

    if not flags["attn"]:
        attn_out = q
    else:
        cos = _rows_from_frames(cos_ref[:], seq_len, x32.shape[0])
        sin = _rows_from_frames(sin_ref[:], seq_len, x32.shape[0])
        dt = x.dtype
        qr = (q * cos + _rotate_half_lanes(q) * sin).astype(dt)
        kr = (k * cos + _rotate_half_lanes(k) * sin).astype(dt)
        vb = v.astype(dt)
        kctx, vctx, seg = kctx_ref[:], vctx_ref[:], seg_ref[:]
        scale_attn = 1.0 / (d**0.5)
        P = n_ctx + 1  # n_live = 1
        slab_scores, slab_v = [], []
        for b in range(n_batches):
            qi = qr[b * seq_len:(b + 1) * seq_len]
            pairs = [
                (kctx[(b * n_ctx + j) * seq_len:(b * n_ctx + j + 1) * seq_len],
                 vctx[(b * n_ctx + j) * seq_len:(b * n_ctx + j + 1) * seq_len],
                 bias_ref[n_ctx, j])
                for j in range(n_ctx)
            ] + [(kr[b * seq_len:(b + 1) * seq_len],
                  vb[b * seq_len:(b + 1) * seq_len],
                  bias_ref[n_ctx, n_ctx])]
            for kj, vj, bj in pairs:
                if flags["scores"]:
                    slab_scores.append(jnp.dot(
                        (qi * kj).astype(dt), seg,
                        preferred_element_type=jnp.float32,
                    ) * scale_attn + bj)
                else:
                    slab_scores.append(
                        qi[:, :num_heads].astype(jnp.float32))
                slab_v.append(vj)
        m_slabs = []
        for g0 in range(n_batches):
            mm = slab_scores[g0 * P]
            for s_ij in slab_scores[g0 * P + 1:(g0 + 1) * P]:
                mm = jnp.maximum(mm, s_ij)
            m_slabs.extend([mm] * P)
        cat = jnp.concatenate(slab_scores, axis=0)
        if flags["softmax"]:
            ecat = jnp.exp(cat - jnp.concatenate(m_slabs, axis=0))
            d_slabs = []
            for g0 in range(n_batches):
                dd = ecat[g0 * P * seq_len:(g0 * P + 1) * seq_len]
                for j in range(1, P):
                    dd = dd + ecat[(g0 * P + j) * seq_len:
                                   (g0 * P + j + 1) * seq_len]
                d_slabs.extend([dd] * P)
            pcat = (ecat / jnp.concatenate(d_slabs, axis=0)).astype(dt)
        else:
            pcat = cat.astype(dt)
        if flags["reexpand"]:
            pexp_cat = jnp.dot(
                pcat, seg.T, preferred_element_type=jnp.float32
            ).astype(dt)
        else:
            # skip the (pairs*S, h) @ (h, D) dot: reuse a same-shape slab
            # built by lane-tiling the probs (keeps the downstream mul+acc)
            reps = Dd // pcat.shape[-1]
            pexp_cat = jnp.concatenate([pcat] * reps, axis=-1)
        out_rows = []
        for g0 in range(n_batches):
            acc = None
            for j in range(P):
                sl = slice((g0 * P + j) * seq_len, (g0 * P + j + 1) * seq_len)
                term = pexp_cat[sl] * slab_v[g0 * P + j]
                acc = term if acc is None else acc + term
            out_rows.append(acc)
        attn_out = jnp.concatenate(out_rows, axis=0).astype(jnp.float32)
    y = _qdot(attn_out, outq_ref, outs_ref)
    y = y + outb_ref[0].astype(jnp.float32)
    g = _rows_from_frames(gate_ref[:].astype(jnp.float32), seq_len,
                          x32.shape[0])
    o_ref[:] = (x32 + g * y).astype(o_ref.dtype)


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
    p.add_argument("--calls", type=int, default=100)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--kernels", default="spatial,temporal")
    p.add_argument("--variants", default="",
                   help="comma list; empty = all")
    args = p.parse_args()
    wanted = set(v for v in args.variants.split(",") if v)
    B = args.batch
    N = B
    d = D // HEADS

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    x = jax.random.normal(ks[0], (N * S, D), jnp.bfloat16)
    sh = jax.random.normal(ks[1], (N, D), jnp.bfloat16)
    sc = jax.random.normal(ks[2], (N, D), jnp.bfloat16)
    g = jax.random.normal(ks[3], (N, D), jnp.bfloat16)
    qkv_q, qkv_s = quantize_weight(jax.random.normal(ks[4], (D, 3 * D)) * .02)
    out_q, out_s = quantize_weight(jax.random.normal(ks[5], (D, D)) * .02)
    out_b = jnp.zeros((1, D), jnp.float32)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    results = {}

    if "spatial" in args.kernels:
        sp_freqs = rope.axial_freqs(
            rope.pixel_freqs(d // 2, 256.0), (9, 16), pixel=True
        ).reshape(S, -1)
        cos1 = jnp.tile(jnp.cos(sp_freqs.astype(jnp.float32)), (N, 1))
        sin1 = jnp.tile(jnp.sin(sp_freqs.astype(jnp.float32)), (N, 1))
        reps = D // cos1.shape[-1]
        cosD = jnp.concatenate([cos1] * reps, axis=-1)
        sinD = jnp.concatenate([sin1] * reps, axis=-1)

        def build_spatial(**flags):
            fl = dict(quant=True, attn=True, rope=True, dots=True,
                      softmax=True)
            fl.update(flags)
            wq = qkv_q if fl["quant"] else qkv_q.astype(jnp.float32) * qkv_s
            wo = out_q if fl["quant"] else out_q.astype(jnp.float32) * out_s

            @jax.jit
            def call(c):
                return pl.pallas_call(
                    functools.partial(
                        _spatial_abl, num_heads=HEADS, n_frames=N, seq_len=S,
                        flags=fl),
                    out_shape=jax.ShapeDtypeStruct(c.shape, c.dtype),
                    in_specs=[full] * 11,
                    out_specs=full,
                    interpret=interpret_mode(),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=64 * 1024 * 1024),
                )(c, sh, sc, g, wq, qkv_s.reshape(1, -1), wo,
                  out_s.reshape(1, -1), out_b, cosD, sinD)
            return call

        for name, flags in (
            ("sp_full", {}),
            ("sp_batched_dots", {"batched_dots": True}),
            ("sp_no_softmax", {"softmax": False}),
            ("sp_no_rope", {"rope": False}),
            ("sp_no_dots", {"dots": False}),
            ("sp_no_attn", {"attn": False}),
            ("sp_no_quant", {"quant": False}),
        ):
            if wanted and name not in wanted:
                continue
            us = time_chain_diff(build_spatial(**flags), x, args.calls)
            results[name] = round(us, 1)
            print(f"{name:16s} {us:8.1f} us/call", flush=True)

    if "temporal" in args.kernels:
        T = N_CTX + 1
        t_freqs = rope.temporal_rope_freqs(jnp.arange(T), rope.lang_freqs(d))
        valid = jnp.ones((T,), bool)
        _, _, R, seg, bias = temporal_preamble(
            t_freqs, valid, B, S, T, HEADS, d, x.dtype)
        cos_t = jnp.cos(t_freqs.astype(jnp.float32))
        sin_t = jnp.sin(t_freqs.astype(jnp.float32))
        cos = jnp.tile(cos_t[N_CTX:T], (B, HEADS))
        sin = jnp.tile(sin_t[N_CTX:T], (B, HEADS))
        k_ctx = jax.random.normal(ks[8], (B * N_CTX * S, D), jnp.bfloat16)
        v_ctx = jax.random.normal(ks[9], (B * N_CTX * S, D), jnp.bfloat16)

        def build_temporal(**flags):
            fl = dict(attn=True, scores=True, softmax=True, reexpand=True)
            fl.update(flags)

            @jax.jit
            def call(c):
                return pl.pallas_call(
                    functools.partial(
                        _temporal_abl, num_heads=HEADS, n_ctx=N_CTX,
                        n_batches=B, seq_len=S, flags=fl),
                    out_shape=jax.ShapeDtypeStruct(c.shape, c.dtype),
                    in_specs=[full] * 14 + [
                        pl.BlockSpec(memory_space=pltpu.SMEM)],
                    out_specs=full,
                    interpret=interpret_mode(),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=64 * 1024 * 1024),
                )(c, sh, sc, g, qkv_q, qkv_s.reshape(1, -1), out_q,
                  out_s.reshape(1, -1), out_b, k_ctx, v_ctx, cos, sin, seg,
                  bias)
            return call

        for name, flags in (
            ("tp_full", {}),
            ("tp_no_softmax", {"softmax": False}),
            ("tp_no_reexpand", {"reexpand": False}),
            ("tp_no_scores", {"scores": False}),
            ("tp_no_attn", {"attn": False}),
        ):
            if wanted and name not in wanted:
                continue
            us = time_chain_diff(build_temporal(**flags), x, args.calls)
            results[name] = round(us, 1)
            print(f"{name:16s} {us:8.1f} us/call", flush=True)

    print({"device": jax.devices()[0].device_kind, "B": B,
           "us_per_call": results})


if __name__ == "__main__":
    main()
