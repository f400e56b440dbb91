"""Fused DiT spatial-attention branch as one Pallas kernel.

Replaces the XLA op chain
    LN -> modulate -> qkv GEMM -> rope -> attention -> out GEMM -> gate -> +x
for one spatiotemporal block's spatial half with a single VMEM-resident
kernel. Profiling the XLA path on v5e showed ~45% of forward time in layout
copies and LN/modulate elementwise chains bouncing through HBM; here the
intermediates never leave VMEM:

  - one kernel call covers the whole (N*S, D) token batch, so weights stream
    from HBM exactly once per call;
  - rotate_half is a constant signed-permutation MATMUL instead of sub-lane
    shuffles (the TPU-slow part of standard rope);
  - heads are processed as 64-lane slices of D (Mosaic has no lane reshape);
  - the temporal variant exploits frame-contiguity of token-major rows:
    causal frame-pair scores are segment sums — no relayout at all;
  - LN statistics, softmax, and all GEMM accumulations run in fp32.

Training support: pallas_call has no autodiff, so gtax.nn.branches wraps each
branch kernel in jax.custom_vjp (kernel forward, XLA-autodiff backward over
an equivalent XLA implementation). Token rows tile over the pallas grid
(_frames_per_tile) so training batches fit VMEM; inference shapes keep the
single-tile layout. Enabled via attention backend "fused"/"fused_all"
(gtax.nn.attention.set_backend) or directly through the branch functions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gtax.kernels.attention import interpret_mode

# fused-branch tiles are independent (parallel grid) and, at training batch
# sizes, a tile's working set slightly exceeds the conservative 16 MB default
# scoped-vmem budget — raise it (v5e has 128 MB VMEM per core)
_BRANCH_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel",),
    vmem_limit_bytes=64 * 1024 * 1024,
)


def rotate_half_matrix(d: int) -> np.ndarray:
    """R such that x @ R == rotate_half(x) for interleaved pairs
    (gtax.core.rope.rotate_half)."""
    R = np.zeros((d, d), np.float32)
    for i in range(d // 2):
        R[2 * i + 1, 2 * i] = -1.0
        R[2 * i, 2 * i + 1] = 1.0
    return R


def _rows_from_frames(v, seq_len, n_rows=None):
    """(F, D) per-frame vectors -> (F*S, D) token rows as a free frame-major
    view + second-minor broadcast (token rows are frame-contiguous and S is a
    sublane multiple). Keeping adaLN vectors and rope tables per-FRAME until
    this point saves the callers' jnp.repeat materialisations: at incremental
    serving shapes the repeated rows were ~40% of the non-weight kernel DMA,
    and at training shapes XLA wrote them through HBM.

    n_rows: the tile's real token-row count. When the wrapper padded the
    per-frame block to a sublane multiple (_pad_frame_rows), v carries
    trailing zero frames; only the first n_rows // seq_len are real."""
    F, D = v.shape
    if n_rows is not None:
        F = n_rows // seq_len
        v = v[:F]
    return jnp.broadcast_to(v[:, None, :], (F, seq_len, D)).reshape(
        F * seq_len, D)


def _pad_frame_rows(arrs, per_tile, n_tiles):
    """Pad per-frame (n_tiles * per_tile, W) vectors so each grid tile's
    frame block has a sublane count Mosaic can lower: block sublanes must be
    a multiple of 8 unless the block spans the whole array (single tile).
    Interpret mode accepts any block, so this only matters on real TPUs.
    Kernels recover the real rows via _rows_from_frames(n_rows=...).
    Returns (padded arrays list, padded per-tile frame count)."""
    if n_tiles == 1 or per_tile % 8 == 0:
        return list(arrs), per_tile
    pad_to = -(-per_tile // 8) * 8
    out = []
    for a in arrs:
        a3 = a.reshape(n_tiles, per_tile, a.shape[-1])
        a3 = jnp.pad(a3, ((0, 0), (0, pad_to - per_tile), (0, 0)))
        out.append(a3.reshape(n_tiles * pad_to, a.shape[-1]))
    return out, pad_to


def _ln_modulate32(x_ref, shift_ref, scale_ref, ln_eps, mod_eps, seq_len):
    """LayerNorm (no affine) + adaLN modulate in fp32. shift/scale arrive as
    per-FRAME (F, D) vectors and are broadcast to token rows here. Shared by
    the bf16 and int8 kernel bodies so the fp32 normalization math can never
    drift between them. Returns (x32, mod32)."""
    x32 = x_ref[:].astype(jnp.float32)
    n_rows = x32.shape[0]
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    ln = (x32 - mean) * jax.lax.rsqrt(var + ln_eps)
    scale = _rows_from_frames(scale_ref[:].astype(jnp.float32), seq_len,
                              n_rows)
    shift = _rows_from_frames(shift_ref[:].astype(jnp.float32), seq_len,
                              n_rows)
    return x32, ln * (1.0 + scale + mod_eps) + shift


def _rotate_half_lanes(x):
    """rotate_half (interleaved pairs: out[2i] = -x[2i+1], out[2i+1] = x[2i])
    over the LANE axis of a full-width (rows, D) slab via two circular lane
    rolls + an even/odd select — ~4 full-lane-width VPU ops replacing the
    per-head (d, d) signed-permutation MXU dots (round-4 measured win: the
    small dots ran at <=16% MXU utilization and half lane width). Pairs never
    straddle head boundaries (head dim is even), so one full-width roll pair
    serves every head at once. Exact: a pure permutation + negate, bit-equal
    to the dot form (whose off-diagonal products were exact zeros)."""
    D = x.shape[-1]
    left = pltpu.roll(x, shift=D - 1, axis=1)  # x[j+1] at lane j (shift >= 0)
    right = pltpu.roll(x, shift=1, axis=1)     # x[j-1] at lane j
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[-1]), 1)
    return jnp.where(lane % 2 == 0, -left, right)


def _rope_rotate(x, cos, sin, R):
    """x * cos + rotate_half(x) * sin in fp32 over full-width (rows, D) slabs
    with per-head tables. R (the (d, d) signed-permutation constant) is kept
    in the signature for the backward kernels' adjoint; the forward
    rotate_half runs as full-width lane rolls (_rotate_half_lanes)."""
    del R
    return x * cos + _rotate_half_lanes(x) * sin


def _spatial_attention_core(q, k, v, cos, sin, R, dtype, num_heads, n_frames,
                            seq_len, qkv_out=None):
    """Per-frame full attention over fp32 qkv (N*S, D) slabs: rope via the
    signed-permutation matmul (full batch, per-head lane slices — Mosaic has
    no lane-dim reshape), then (frame, head)-looped attention on
    VMEM-resident tiles. Returns fp32 (N*S, D). Shared by the bf16 and int8
    kernels — only the GEMMs around it differ.

    qkv_out: optional (q_ref, k_ref, v_ref) output refs — the POST-rope q/k
    and cast v rows are also written out (emit_train: the residuals the
    hand-written training backward consumes, gtax.nn.branches)."""
    S = seq_len
    D = q.shape[-1]
    d = D // num_heads
    scale_attn = 1.0 / (d**0.5)
    # Full-width rope: the per-head (rows, d) cos/sin tables are identical
    # across heads, so tile them to D lanes once and apply rope to the whole
    # q/k slab — one elementwise chain + two lane rolls instead of num_heads
    # half-lane-width chains + 2*num_heads small MXU dots (bit-identical; see
    # _rotate_half_lanes).
    if cos.shape[-1] == D:
        cosD, sinD = cos, sin
    else:
        reps = D // cos.shape[-1]
        cosD = jnp.concatenate([cos] * reps, axis=-1)
        sinD = jnp.concatenate([sin] * reps, axis=-1)
    qr = (q * cosD + _rotate_half_lanes(q) * sinD).astype(dtype)
    kr = (k * cosD + _rotate_half_lanes(k) * sinD).astype(dtype)
    vb = v.astype(dtype)
    # Per-head BATCHED dots over frames: one 3D dot_general with the frame
    # axis as a batch dim — (F, S, d) x (F, S, d) contracting d — instead of
    # a small (S, d) x (d, S) dot per (head, frame). Mosaic lowers batch
    # dims natively (tpu.matmul dot_dimension_numbers), and the per-dot MXU
    # issue/weight-load latency of 2*H*F small k=64 dots measured ~30 us of
    # the B=8 int8 kernel's 67 us (scripts/b8_ablation.py: sp_no_dots);
    # batching over frames cut the kernel 84 -> 71 us/call same-run. The
    # (fpt*S, d) -> (fpt, S, d) leading-dim split is layout-free, and the
    # contraction order per (frame, head) block is unchanged —
    # bit-identical to the looped form (CPU-pinned).
    score_blocks = []
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        q3 = qr[:, sl].reshape(n_frames, S, d)
        k3 = kr[:, sl].reshape(n_frames, S, d)
        s3 = jax.lax.dot_general(
            q3, k3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale_attn
        score_blocks.append(s3.reshape(n_frames * S, S))
    # One softmax op-chain over all (head, frame) score blocks stacked on the
    # sublane axis instead of num_heads*n_frames separate chains: the per-row
    # math (max/exp/sum/div in fp32) is bit-identical, but the VPU runs ~H*F x
    # fewer instruction dispatches on (S, S) lane-padded buffers (S=144 pads
    # to 2 lane tiles) — measured win on the incremental serving path.
    scores = (score_blocks[0] if len(score_blocks) == 1
              else jnp.concatenate(score_blocks, axis=0))
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
    head_outs = []
    for h in range(num_heads):
        v3 = vb[:, h * d:(h + 1) * d].reshape(n_frames, S, d)
        p3 = probs[h * n_frames * S:(h + 1) * n_frames * S].reshape(
            n_frames, S, S)
        o3 = jax.lax.dot_general(
            p3, v3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        head_outs.append(o3.reshape(n_frames * S, d))
    if qkv_out is not None:
        qkv_out[0][:] = qr
        qkv_out[1][:] = kr
        qkv_out[2][:] = vb
    # heads are contiguous d-slices of D in (h, d) order
    return jnp.concatenate(head_outs, axis=-1)


def _kernel(x_ref, shift_ref, scale_ref, gate_ref, qkvw_ref, outw_ref,
            outb_ref, cos_ref, sin_ref, rot_ref, o_ref, q_ref=None,
            k_ref=None, v_ref=None, y_ref=None, *, num_heads,
            n_frames, seq_len, ln_eps, mod_eps):
    """One kernel call = the whole (N*S, D) token batch: weights stream from
    HBM exactly once. LN/modulate/qkv/out run as full-batch GEMMs; only the
    attention itself loops over (frame, head) on VMEM-resident tiles.

    q/k/v/y_ref (emit_train): post-rope q/k, cast v, and the pre-gate branch
    output — residuals for the hand-written training backward."""
    x = x_ref[:]  # (N*S, D) bf16
    NS, D = x.shape

    x32, mod32 = _ln_modulate32(x_ref, shift_ref, scale_ref, ln_eps, mod_eps,
                                seq_len)
    mod = mod32.astype(x.dtype)

    # fused qkv GEMM over all tokens
    qkv = jnp.dot(mod, qkvw_ref[:], preferred_element_type=jnp.float32)
    q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]

    attn_out = _spatial_attention_core(
        q, k, v, cos_ref[:], sin_ref[:], rot_ref[:], x.dtype, num_heads,
        n_frames, seq_len,
        qkv_out=None if q_ref is None else (q_ref, k_ref, v_ref),
    ).astype(x.dtype)

    # output projection + bias over all tokens
    y = jnp.dot(attn_out, outw_ref[:], preferred_element_type=jnp.float32)
    y = y + outb_ref[0].astype(jnp.float32)
    if y_ref is not None:
        y_ref[:] = y.astype(y_ref.dtype)

    # gated residual
    g = _rows_from_frames(gate_ref[:].astype(jnp.float32), seq_len,
                          x32.shape[0])
    o_ref[:] = (x32 + g * y).astype(o_ref.dtype)


def _temporal_kernel(x_ref, shift_ref, scale_ref, gate_ref, qkvw_ref,
                     outw_ref, outb_ref, cos_ref, sin_ref, rot_ref, seg_ref,
                     bias_ref, o_ref, k_ref=None, v_ref=None, q_ref=None,
                     y_ref=None, *, num_heads, n_frames, n_batches, seq_len,
                     ln_eps, mod_eps):
    """Fused temporal (causal) attention branch.

    Token-major (N*S, D) rows are FRAME-CONTIGUOUS, so attention over frames
    needs no relayout: for each causal frame pair (i, j) the per-head scores
    are segment sums (qi * kj) @ seg, where seg is the (D, h) head-indicator
    matrix, and probabilities are re-expanded with seg^T. With T <= 5 this is
    ~15 pairs of one multiply + two tiny GEMMs — all VMEM-resident.

    bias: (T, T) additive mask in SMEM (causal + validity + open diagonal),
    computed by the caller.
    """
    x = x_ref[:]  # (N*S, D)
    NS, D = x.shape

    x32, mod32 = _ln_modulate32(x_ref, shift_ref, scale_ref, ln_eps, mod_eps,
                                seq_len)
    mod = mod32.astype(x.dtype)

    qkv = jnp.dot(mod, qkvw_ref[:], preferred_element_type=jnp.float32)
    q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]

    attn_out = _temporal_attention_core(
        q, k, v, _rows_from_frames(cos_ref[:], seq_len, x32.shape[0]),
        _rows_from_frames(sin_ref[:], seq_len, x32.shape[0]),
        rot_ref[:], seg_ref[:],
        bias_ref, x.dtype, num_heads, n_frames, n_batches, seq_len,
        kv_out=None if k_ref is None else (k_ref, v_ref),
        q_out=q_ref,
    ).astype(x.dtype)

    y = jnp.dot(attn_out, outw_ref[:], preferred_element_type=jnp.float32)
    y = y + outb_ref[0].astype(jnp.float32)
    if y_ref is not None:
        y_ref[:] = y.astype(y_ref.dtype)
    g = _rows_from_frames(gate_ref[:].astype(jnp.float32), seq_len,
                          x32.shape[0])
    o_ref[:] = (x32 + g * y).astype(o_ref.dtype)


def _temporal_attention_core(q, k, v, cos, sin, R, seg, bias_ref, dtype,
                             num_heads, n_frames, n_batches, seq_len,
                             kv_out=None, q_out=None):
    """Causal frame-pair attention over fp32 qkv (N*S, D) slabs: full-width
    rope over the frame axis (rotate_half via per-head (d, d) signed
    permutation dots), then segment-sum scores per causal (i, j) frame pair —
    token-major rows are frame-contiguous so no relayout is needed. Returns
    fp32 (N*S, D). Shared by the bf16 and int8 kernels.

    kv_out: optional (k_ref, v_ref) output refs — the post-rope K and cast V
    are ALSO written out, feeding the incremental-decoding context cache
    (gtax.models.dit.dit_prefill): context rows are step-invariant during a
    frame's denoise scan, so later steps reuse these instead of recomputing
    the whole window."""
    S = seq_len
    T = n_frames
    D = q.shape[-1]
    d = D // num_heads
    q = _rope_rotate(q, cos, sin, R).astype(dtype)
    k = _rope_rotate(k, cos, sin, R).astype(dtype)
    v = v.astype(dtype)
    if kv_out is not None:
        kv_out[0][:] = k
        kv_out[1][:] = v
    if q_out is not None:
        q_out[:] = q

    scale_attn = 1.0 / (d**0.5)
    out_rows = []
    for b in range(n_batches):
        base = b * T * S

        def frame(t, arr):
            return arr[base + t * S: base + (t + 1) * S]

        # scores[i][j]: (S, h) fp32 for causal pairs j <= i
        scores = [[None] * T for _ in range(T)]
        for i in range(T):
            qi = frame(i, q)
            for j in range(i + 1):
                kj = frame(j, k)
                scores[i][j] = jnp.dot(
                    (qi * kj).astype(dtype), seg,
                    preferred_element_type=jnp.float32,
                ) * scale_attn + bias_ref[i, j]

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
                probs = (e / denom).astype(dtype)
                pexp = jnp.dot(
                    probs, seg.T, preferred_element_type=jnp.float32
                ).astype(dtype)
                term = pexp * frame(j, v)
                acc = term if acc is None else acc + term
            out_rows.append(acc)
    return jnp.concatenate(out_rows, axis=0).astype(jnp.float32)


def _temporal_step_core(q, k, v, kctx, vctx, cos, sin, R, seg, bias_ref,
                        dtype, num_heads, n_ctx, n_batches, seq_len,
                        n_live=1):
    """LIVE-SLOT causal attention against cached context K/V (incremental
    decoding): q/k/v are the n_live live frames' rows occupying window slots
    n_ctx..n_ctx+n_live-1 (rope applied here at those slot positions);
    kctx/vctx are the post-rope context rows emitted by the full kernel's
    kv_out during prefill. Live frame i attends to every context frame plus
    live frames 0..i (causal); same segment-sum score math, per-row identical
    to the full core's output for those slots. bias_ref: the (T, T) additive
    mask, T = n_ctx + n_live. n_live=1 is the exact-sampling incremental
    path; n_live>1 serves pipelined rollouts whose P in-flight frames all
    change per call while the context stays prefilled."""
    S = seq_len
    D = q.shape[-1]
    d = D // num_heads
    q = _rope_rotate(q, cos, sin, R).astype(dtype)
    k = _rope_rotate(k, cos, sin, R).astype(dtype)
    v = v.astype(dtype)
    scale_attn = 1.0 / (d**0.5)

    # Per-(batch, live, key) loop of small segment-sum SCORE dots (a stacked
    # dot variant measured NEUTRAL in round 3 — Mosaic inlines the small dots
    # for free) — but the elementwise softmax op-chain and the probs
    # re-expand are BATCHED across every (batch, live, key) slab: one exp,
    # one division (on slab-tiled denominators — same op on the same values,
    # bit-identical to per-slab e/denom), one cast and one (pairs*S, h) x
    # (h, D) re-expand dot instead of ~n_pairs of each. Same trick as the
    # spatial core's stacked softmax: the VPU pays per-op dispatch on tiny
    # lane-padded (S, 16) buffers, so fewer, taller ops win.
    slab_scores, slab_v, group_sizes = [], [], []
    for b in range(n_batches):
        def live_frame(i, arr, b=b):
            base = (b * n_live + i) * S
            return arr[base: base + S]

        def ctx_frame(j, arr, b=b):
            base = b * n_ctx * S
            return arr[base + j * S: base + (j + 1) * S]

        for i in range(n_live):
            qi = live_frame(i, q)
            # keys in window-slot order: context 0..n_ctx-1, live 0..i
            kv_pairs = [
                (ctx_frame(j, kctx), ctx_frame(j, vctx), bias_ref[n_ctx + i, j])
                for j in range(n_ctx)
            ] + [
                (live_frame(j, k), live_frame(j, v),
                 bias_ref[n_ctx + i, n_ctx + j])
                for j in range(i + 1)
            ]
            for kj, vj, bj in kv_pairs:
                slab_scores.append(jnp.dot(
                    (qi * kj).astype(dtype), seg,
                    preferred_element_type=jnp.float32,
                ) * scale_attn + bj)
                slab_v.append(vj)
            group_sizes.append(len(kv_pairs))

    # group maxes (elementwise across each group's slabs, as before)
    m_slabs, idx = [], 0
    for P in group_sizes:
        m = slab_scores[idx]
        for s_ij in slab_scores[idx + 1: idx + P]:
            m = jnp.maximum(m, s_ij)
        m_slabs.extend([m] * P)
        idx += P
    cat = jnp.concatenate(slab_scores, axis=0)
    mcat = cat - jnp.concatenate(m_slabs, axis=0)
    ecat = jnp.exp(mcat)

    def slab(arr, n):
        return arr[n * S:(n + 1) * S]

    d_slabs, idx = [], 0
    for P in group_sizes:
        denom = slab(ecat, idx)
        for j in range(1, P):
            denom = denom + slab(ecat, idx + j)
        d_slabs.extend([denom] * P)
        idx += P
    pcat = (ecat / jnp.concatenate(d_slabs, axis=0)).astype(dtype)
    pexp_cat = jnp.dot(
        pcat, seg.T, preferred_element_type=jnp.float32
    ).astype(dtype)

    out_rows, idx = [], 0
    for P in group_sizes:
        acc = None
        for j in range(P):
            term = slab(pexp_cat, idx + j) * slab_v[idx + j]
            acc = term if acc is None else acc + term
        out_rows.append(acc)
        idx += P
    out = out_rows[0] if len(out_rows) == 1 else jnp.concatenate(
        out_rows, axis=0)
    return out.astype(jnp.float32)


def _temporal_step_kernel(x_ref, shift_ref, scale_ref, gate_ref, qkvw_ref,
                          outw_ref, outb_ref, kctx_ref, vctx_ref, cos_ref,
                          sin_ref, rot_ref, seg_ref, bias_ref, o_ref, *,
                          num_heads, n_ctx, n_batches, seq_len, ln_eps,
                          mod_eps, n_live=1):
    """Fused incremental temporal branch (bf16): the live frames' rows only,
    attending to cached context K/V."""
    x = x_ref[:]
    NS, D = x.shape
    x32, mod32 = _ln_modulate32(x_ref, shift_ref, scale_ref, ln_eps, mod_eps,
                                seq_len)
    mod = mod32.astype(x.dtype)
    qkv = jnp.dot(mod, qkvw_ref[:], preferred_element_type=jnp.float32)
    q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]
    attn_out = _temporal_step_core(
        q, k, v, kctx_ref[:], vctx_ref[:],
        _rows_from_frames(cos_ref[:], seq_len, x32.shape[0]),
        _rows_from_frames(sin_ref[:], seq_len, x32.shape[0]),
        rot_ref[:], seg_ref[:], bias_ref, x.dtype, num_heads, n_ctx,
        n_batches, seq_len, n_live=n_live,
    ).astype(x.dtype)
    y = jnp.dot(attn_out, outw_ref[:], preferred_element_type=jnp.float32)
    y = y + outb_ref[0].astype(jnp.float32)
    g = _rows_from_frames(gate_ref[:].astype(jnp.float32), seq_len,
                          x32.shape[0])
    o_ref[:] = (x32 + g * y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "n_ctx", "n_live",
                                              "batch_tile"))
def fused_temporal_step(x, shift, scale, gate, qkv_w, out_w, out_b, k_ctx,
                        v_ctx, rope_freqs, valid, num_heads, n_ctx, n_live=1,
                        batch_tile=None):
    """Incremental temporal branch: x (B*n_live, S, D) = live-frame tokens
    at window slots n_ctx..n_ctx+n_live-1, frame-major within batch;
    k_ctx/v_ctx (B*n_ctx*S, D) post-rope cache (fused_temporal_branch
    emit_kv=True); rope_freqs (T, d) with T = n_ctx + n_live; valid (T,) or
    None. Returns x + gate * CausalAttention_liveslots(modulate(LN(x)))."""
    N, S, D = x.shape
    B = N // n_live
    T = n_ctx + n_live
    d = D // num_heads
    _, _, R, seg, bias = temporal_preamble(
        rope_freqs, valid, B, S, T, num_heads, d, x.dtype
    )
    cos_t = jnp.cos(rope_freqs.astype(jnp.float32))
    sin_t = jnp.sin(rope_freqs.astype(jnp.float32))
    # per-live-frame (N, D) slot tables; the kernel broadcasts to token rows
    cos = jnp.tile(cos_t[n_ctx:T], (B, num_heads))
    sin = jnp.tile(sin_t[n_ctx:T], (B, num_heads))
    xf = x.reshape(N * S, D)
    out_b = out_b.reshape(1, -1)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    b_pt = batch_tile or _step_batches_per_tile(B, n_live, n_ctx, S)
    if b_pt == B:
        out = pl.pallas_call(
            functools.partial(
                _temporal_step_kernel, num_heads=num_heads, n_ctx=n_ctx,
                n_batches=B, seq_len=S, ln_eps=1e-6, mod_eps=1e-6,
                n_live=n_live,
            ),
            out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
            in_specs=[full] * 13 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=full,
            interpret=interpret_mode(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(xf, shift, scale, gate, qkv_w, out_w, out_b, k_ctx, v_ctx, cos,
          sin, R, seg, bias)
        return out.reshape(N, S, D)
    # batch-tiled: temporal attention crosses frames WITHIN a batch element
    # only, so tiles chunk exactly over batch elements — each with its own
    # live rows AND its slice of the context K/V cache. Lifts the gridless
    # form's VMEM ceiling (B=16 OOMed at flagship size) and bounds the
    # per-tile unroll.
    n_tiles = B // b_pt
    row_spec = pl.BlockSpec((b_pt * n_live * S, D), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)
    ctx_spec = pl.BlockSpec((b_pt * n_ctx * S, D), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)
    (shift, scale, gate, cos, sin), fpt_pad = _pad_frame_rows(
        (shift, scale, gate, cos, sin), b_pt * n_live, n_tiles)
    frame_spec = pl.BlockSpec((fpt_pad, D), lambda t: (t, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _temporal_step_kernel, num_heads=num_heads, n_ctx=n_ctx,
            n_batches=b_pt, seq_len=S, ln_eps=1e-6, mod_eps=1e-6,
            n_live=n_live,
        ),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        grid=(n_tiles,),
        in_specs=[
            row_spec, frame_spec, frame_spec, frame_spec,  # x + adaLN vecs
            full, full, full,                        # qkv_w, out_w, out_b
            ctx_spec, ctx_spec,                      # k_ctx, v_ctx
            frame_spec, frame_spec,                  # cos, sin
            full, full,                              # R, seg
            pl.BlockSpec(memory_space=pltpu.SMEM),   # bias
        ],
        out_specs=row_spec,
        interpret=interpret_mode(),
        compiler_params=_BRANCH_PARAMS,
    )(xf, shift, scale, gate, qkv_w, out_w, out_b, k_ctx, v_ctx, cos, sin,
      R, seg, bias)
    return out.reshape(N, S, D)


def _step_batches_per_tile(B: int, n_live: int, n_ctx: int,
                           seq_len: int, max_pair_rows: int = 5760) -> int:
    """Batch elements per tile for the incremental temporal-step kernels.

    Round 4 (measured, B=8 flagship): ONE batch element per tile beats the
    gridless single-call form 57.8 vs 87.7 us/call — temporal attention
    crosses frames within a batch element only, so per-element tiles let
    the Pallas grid pipeline double-buffer each element's context-K/V DMA
    (~1.2 MB/element) and live rows behind the previous element's compute,
    where the gridless call serialises the whole ~16 MB input fetch before
    the body. B <= 2 keeps the gridless form: at those sizes the whole
    fetch is small, the paired kernels own the production path
    (_PAIR_MAX_FRAMES), and gridless B=1 was the round-3 measured winner.

    The guard below still bounds the per-tile VMEM peak for huge
    n_live/n_ctx combinations (pipelined serving).

    The dominant VMEM term is the batched probs re-expand in
    _temporal_step_core: a (total_pairs * S, D) fp32 dot output (+ its
    compute-dtype cast), where total_pairs = sum over live frames of
    (n_ctx + i + 1) attention (query-frame, key-frame) slabs — NOT the
    (n_live + n_ctx) * S live+context rows the pre-round-3 per-slab variant
    peaked at. The guard therefore counts PAIR rows. Calibration: flagship
    serving (B=8, n_live=1, n_ctx=4, S=144, D=1024) gives 40 slabs = 5760
    pair rows -> a ~23.6 MB fp32 re-expand + ~11.8 MB bf16 cast, measured to
    fit v5e's 64 MB scoped VMEM on the real chip (on-chip lane,
    tests/test_tpu_kernels.py). With n_live == 1 pair rows == frame rows, so
    every previously-proven single-live shape tiles identically; n_live > 1
    (pipelined serving) now tiles sooner, bounding the quadratic pair growth
    the old frame-row guard under-counted (ADVICE r3)."""
    pairs_per_batch = n_live * n_ctx + n_live * (n_live + 1) // 2
    per_batch = pairs_per_batch * seq_len
    if B <= 2 and B * per_batch <= max_pair_rows:
        return B
    # B > 2 (or an oversized pipelined tile): one batch element per tile.
    # Round-5 negative result: 2 elements/tile at B=8 (and 4 at B=16) won
    # isolated microbenchmarks (61.4 vs 67.9 us/call) but measured neutral
    # in the full rollout — the extra per-tile VMEM shrinks cross-kernel
    # overlap by as much as the in-kernel latency win (docs/PERF.md
    # round-5 serving). 1/tile is the measured-fastest AND VMEM-bounded form.
    return 1


def temporal_preamble(rope_freqs, valid, B, S, T, num_heads, d, dtype):
    """Shared inputs for every fused temporal-attention variant: per-row rope
    cos/sin tables tiled over tokens and heads, the per-head (d, d)
    rotate-half permutation R, the head-indicator segment matrix seg, and
    the additive causal+validity bias (always-open diagonal for padded
    queries). PARITY-CRITICAL mask math — one implementation serves the
    trainable full-window and incremental-step kernels (bf16 and int8) so
    the paths can never drift."""
    del S  # tables are per-FRAME; kernels broadcast to token rows in-VMEM
    cos_t = jnp.cos(rope_freqs.astype(jnp.float32))  # (T, d)
    sin_t = jnp.sin(rope_freqs.astype(jnp.float32))
    cos = jnp.tile(cos_t, (B, num_heads))  # (B*T, D)
    sin = jnp.tile(sin_t, (B, num_heads))
    R = jnp.asarray(rotate_half_matrix(d))
    seg = jnp.asarray(
        np.kron(np.eye(num_heads, dtype=np.float32),
                np.ones((d, 1), np.float32))
    ).astype(dtype)  # (D, h)

    causal = np.tril(np.ones((T, T), dtype=bool))
    if valid is not None:
        key_ok = jnp.logical_or(valid[None, :], jnp.eye(T, dtype=bool))
        allow = jnp.logical_and(jnp.asarray(causal), key_ok)
    else:
        allow = jnp.asarray(causal)
    bias = jnp.where(allow, 0.0, -1e30).astype(jnp.float32)
    return cos, sin, R, seg, bias


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "n_frames", "emit_kv",
                                    "emit_train"))
def fused_temporal_branch(x, shift, scale, gate, qkv_w, out_w, out_b,
                          rope_freqs, valid, num_heads, n_frames,
                          emit_kv=False, emit_train=False):
    """x: (N=B*T, S, D) frame-major token tiles; shift/scale/gate: (N, D);
    rope_freqs: (T, rot) temporal table; valid: (T,) bool or None.
    Returns x + gate * TemporalCausalAttention(modulate(LN(x))).

    emit_kv=True additionally returns the post-rope (k, v) rows (N, S, D) —
    the context cache consumed by fused_temporal_step (incremental
    decoding). emit_train=True returns (o, q, k, v, y): post-rope q/k, cast
    v, and the pre-gate branch output — the residuals the hand-written
    training backward consumes (gtax.nn.branches)."""
    N, S, D = x.shape
    T = n_frames
    B = N // T
    d = D // num_heads
    cos, sin, R, seg, bias = temporal_preamble(
        rope_freqs, valid, B, S, T, num_heads, d, x.dtype
    )

    xf = x.reshape(N * S, D)
    out_b = out_b.reshape(1, -1)
    # temporal attention crosses frames WITHIN a batch element only, so the
    # rows chunk exactly over batch elements (grid); each tile holds b_pt
    # elements' full T*S rows — inference (B=1) keeps one tile
    b_pt = _frames_per_tile(B, T * S)
    n_tiles = B // b_pt
    tile_rows = b_pt * T * S
    row_spec = pl.BlockSpec((tile_rows, D), lambda c: (c, 0),
                            memory_space=pltpu.VMEM)
    # per-frame vectors: b_pt * T rows per tile (adaLN + rope tables),
    # padded to a Mosaic-lowerable sublane block when the grid has >1 tile
    (shift, scale, gate, cos, sin), fpt_pad = _pad_frame_rows(
        (shift, scale, gate, cos, sin), b_pt * T, n_tiles)
    frame_spec = pl.BlockSpec((fpt_pad, D), lambda c: (c, 0),
                              memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    one = jax.ShapeDtypeStruct(xf.shape, x.dtype)
    assert not (emit_kv and emit_train)
    n_out = 5 if emit_train else (3 if emit_kv else 1)
    out = pl.pallas_call(
        functools.partial(
            _temporal_kernel, num_heads=num_heads, n_frames=T,
            n_batches=b_pt, seq_len=S, ln_eps=1e-6, mod_eps=1e-6,
        ),
        out_shape=(one,) * n_out if n_out > 1 else one,
        grid=(n_tiles,),
        in_specs=[
            row_spec, frame_spec, frame_spec, frame_spec,  # x + adaLN vecs
            full, full, full,                        # qkv_w, out_w, out_b
            frame_spec, frame_spec,                  # cos, sin (per-frame)
            full, full,                              # R, seg
            pl.BlockSpec(memory_space=pltpu.SMEM),   # bias (T, T)
        ],
        out_specs=(row_spec,) * n_out if n_out > 1 else row_spec,
        interpret=interpret_mode(),
        compiler_params=_BRANCH_PARAMS,
    )(xf, shift, scale, gate, qkv_w, out_w, out_b, cos, sin, R, seg, bias)
    if emit_train:
        # kernel output order: (o, k, v, q, y) -> return (o, q, k, v, y)
        o, kk, vv, qq, yy = (a.reshape(N, S, D) for a in out)
        return o, qq, kk, vv, yy
    if emit_kv:
        o, kk, vv = out
        return (o.reshape(N, S, D), kk.reshape(N, S, D), vv.reshape(N, S, D))
    return out.reshape(N, S, D)


def _mlp_kernel(x_ref, shift_ref, scale_ref, gate_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, o_ref, h1_ref=None, y_ref=None, *, seq_len,
                ln_eps, mod_eps, approx_gelu):
    """Fused LN -> modulate -> fc1 -> gelu -> fc2 -> gate -> residual, whole
    branch in ONE VMEM-resident pass. At DiT-S/2 size the full MLP weights
    (D x H + H x D bf16 ~ 17 MB) and the hidden activation (tokens x H) fit
    VMEM comfortably, so nothing is chunked: each weight byte streams from
    HBM exactly once and LN/modulate run exactly once. (Round-1's chunked
    variant recomputed LN per weight chunk and lost to XLA; this single-pass
    version is the fix — VERDICT r1 next-#3.)

    h1_ref/y_ref (emit_train): the pre-gelu fc1 activation and the pre-gate
    branch output, the residuals the hand-written training backward consumes
    (gtax.nn.branches) instead of recomputing the branch forward."""
    x = x_ref[:]  # (N*S, D)

    x32, mod32 = _ln_modulate32(x_ref, shift_ref, scale_ref, ln_eps, mod_eps,
                                seq_len)
    mod = mod32.astype(x.dtype)

    h = jnp.dot(mod, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)
    if h1_ref is not None:
        h1_ref[:] = h.astype(h1_ref.dtype)
    h = jax.nn.gelu(h, approximate=approx_gelu).astype(x.dtype)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    y = y + b2_ref[0].astype(jnp.float32)
    if y_ref is not None:
        y_ref[:] = y.astype(y_ref.dtype)

    g = _rows_from_frames(gate_ref[:].astype(jnp.float32), seq_len,
                          x32.shape[0])
    o_ref[:] = (x32 + g * y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("approx_gelu", "emit_train"))
def fused_mlp_branch(x, shift, scale, gate, w1, b1, w2, b2,
                     approx_gelu=True, emit_train=False):
    """x: (N, S, D); shift/scale/gate: (N, D); w1: (D, H); w2: (H, D).
    Returns x + gate * MLP(modulate(LN(x))).

    emit_train=True additionally returns (h1, y): the pre-gelu fc1
    activation (N, S, H) and pre-gate branch output (N, S, D), consumed by
    the residual-based training backward (gtax.nn.branches)."""
    N, S, D = x.shape
    H = w1.shape[1]
    xf = x.reshape(N * S, D)
    b1 = b1.reshape(1, H)
    b2 = b2.reshape(1, D)
    # rows are independent: chunk over frame tiles for training batches
    fpt = _frames_per_tile(N, S)
    n_tiles = N // fpt
    tile_rows = fpt * S
    row_spec = pl.BlockSpec((tile_rows, D), lambda c: (c, 0),
                            memory_space=pltpu.VMEM)
    (shift, scale, gate), fpt_pad = _pad_frame_rows(
        (shift, scale, gate), fpt, n_tiles)
    frame_spec = pl.BlockSpec((fpt_pad, D), lambda c: (c, 0),
                              memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    one = jax.ShapeDtypeStruct(xf.shape, x.dtype)
    hid_spec = pl.BlockSpec((tile_rows, H), lambda c: (c, 0),
                            memory_space=pltpu.VMEM)
    hid = jax.ShapeDtypeStruct((N * S, H), x.dtype)
    out = pl.pallas_call(
        functools.partial(
            _mlp_kernel, seq_len=S, ln_eps=1e-6, mod_eps=1e-6,
            approx_gelu=approx_gelu,
        ),
        out_shape=(one, hid, one) if emit_train else one,
        grid=(n_tiles,),
        in_specs=[row_spec, frame_spec, frame_spec, frame_spec,
                  full, full, full, full],
        out_specs=(row_spec, hid_spec, row_spec) if emit_train else row_spec,
        interpret=interpret_mode(),
        compiler_params=_BRANCH_PARAMS,
    )(xf, shift, scale, gate, w1, b1, w2, b2)
    if emit_train:
        o, h1, y = out
        return (o.reshape(N, S, D), h1.reshape(N, S, H),
                y.reshape(N, S, D))
    return out.reshape(N, S, D)


def _frames_per_tile(n_frames: int, seq_len: int, max_rows: int = 768) -> int:
    """Largest divisor of n_frames whose tile stays within the VMEM budget
    proven by the inference shapes (~720 rows). Training batches (N*S in the
    thousands) are chunked on the pallas grid; inference (N*S <= max_rows)
    keeps the original single-tile behaviour."""
    per = max(1, min(n_frames, max_rows // seq_len if seq_len <= max_rows
                     else 1))
    while n_frames % per:
        per -= 1
    return per


@functools.partial(jax.jit, static_argnames=("num_heads", "emit_train"))
def fused_spatial_branch(x, shift, scale, gate, qkv_w, out_w, out_b,
                         rope_freqs, num_heads, emit_train=False):
    """x: (N, S, D) per-frame token tiles; shift/scale/gate: (N, D);
    qkv_w: (D, 3D); out_w: (D, D); out_b: (D,);
    rope_freqs: (S, rot_dim) pixel-axial table (rot_dim == head_dim).
    Returns x + gate * SpatialAttention(modulate(LN(x))).

    Frames are independent in spatial attention, so the token rows chunk
    exactly over a grid of frame tiles (weights re-stream per tile — cheap
    next to the tile's compute at training batch sizes).

    emit_train=True additionally returns (q, k, v, y): post-rope q/k, cast
    v, and the pre-gate branch output (all (N, S, D)) — the residuals the
    hand-written training backward consumes (gtax.nn.branches).
    """
    N, S, D = x.shape
    d = D // num_heads
    fpt = _frames_per_tile(N, S)
    n_tiles = N // fpt
    tile_rows = fpt * S
    cos = jnp.tile(jnp.cos(rope_freqs.astype(jnp.float32)), (N, 1))
    sin = jnp.tile(jnp.sin(rope_freqs.astype(jnp.float32)), (N, 1))
    R = jnp.asarray(rotate_half_matrix(d))
    out_b = out_b.reshape(1, -1)
    xf = x.reshape(N * S, D)
    row_spec = pl.BlockSpec((tile_rows, D), lambda c: (c, 0),
                            memory_space=pltpu.VMEM)
    (shift, scale, gate), fpt_pad = _pad_frame_rows(
        (shift, scale, gate), fpt, n_tiles)
    frame_spec = pl.BlockSpec((fpt_pad, D), lambda c: (c, 0),
                              memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    rot = rope_freqs.shape[-1]
    one = jax.ShapeDtypeStruct(xf.shape, x.dtype)
    out = pl.pallas_call(
        functools.partial(
            _kernel, num_heads=num_heads, n_frames=fpt, seq_len=S,
            ln_eps=1e-6, mod_eps=1e-6,
        ),
        out_shape=(one,) * 5 if emit_train else one,
        grid=(n_tiles,),
        in_specs=[
            row_spec, frame_spec, frame_spec, frame_spec,  # x + adaLN vecs
            full, full, full,                        # qkv_w, out_w, out_b
            pl.BlockSpec((tile_rows, rot), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),   # cos
            pl.BlockSpec((tile_rows, rot), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),   # sin
            full,                                    # R
        ],
        out_specs=(row_spec,) * 5 if emit_train else row_spec,
        interpret=interpret_mode(),
        compiler_params=_BRANCH_PARAMS,
    )(xf, shift, scale, gate, qkv_w, out_w, out_b, cos, sin, R)
    if emit_train:
        return tuple(a.reshape(N, S, D) for a in out)
    return out.reshape(N, S, D)
