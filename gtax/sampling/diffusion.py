"""Diffusion-forcing sampler and training loss.

Parity targets:
  - denoise_step            /root/reference/train_dit.py:30-125
  - rollout loop            /root/reference/generate.py:200-235,
                            train_dit.py predict() :371-464
  - renoise eval            train_dit.py predict_noise() :466-552
  - diffusion-forcing loss  train_dit.py _shared_step() :554-682

TPU-native design: the reference's Python loops (outer over frames, inner over
noise steps) become nested `lax.scan`s over a FIXED `max_frames`-slot window.
Growing contexts (n_prompt_frames < max_frames-1) are handled by left-padding
the window and masking padded slots out of temporal attention — RoPE is
relative, so the valid frames see identical attention to the reference's
variable-length crop (verified against golden fixtures). One compiled shape
therefore serves the entire autoregressive rollout, and the whole
(frames x noise-steps) loop nest runs on-device with no host round-trips.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from gtax.core import schedules
from gtax.core.constants import MAX_NOISE_LEVEL, NOISE_ABS_MAX


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    ddim_noise_steps: int = 100
    stabilization_level: int = 15
    noise_abs_max: float = NOISE_ABS_MAX
    max_noise_level: int = MAX_NOISE_LEVEL
    schedule_clamp_min: float = 1e-4  # generate.py default; trainer uses 1e-6
    # attention broadcast (Pyramid Attention Broadcast, arxiv 2408.12588):
    # recompute the DiT's attention branches every K-th denoise step and
    # reuse their cached residual deltas in between (attention outputs drift
    # slowly across adjacent steps). 1 = off (exact reference scheme); the
    # final noise_idx<=0 step always recomputes. Takes effect when the
    # rollout is built with pab fns (make_rollout, gtax.models.dit).
    attn_broadcast: int = 1

    def tables(self):
        betas = schedules.sigmoid_beta_schedule(
            self.max_noise_level, clamp_min=self.schedule_clamp_min
        )
        abar = schedules.alphas_cumprod_from_betas(betas)
        noise_range = schedules.ddim_noise_range(
            self.ddim_noise_steps, self.max_noise_level
        )
        return abar, noise_range


def _expand(a):
    """(B, T) -> (B, T, 1, 1, 1) for broadcasting against latents."""
    return a[:, :, None, None, None]


def _ddim_update(x, v, alpha, alpha_next, noise_idx):
    """The DDIM v-prediction update (reference train_dit.py:110-123): recover
    x_start and the implied noise from v, re-noise to alpha_next, return
    x_start itself at the final step. alpha/alpha_next broadcast against x —
    per-frame columns in denoise_step, scalars on the last-row-only
    incremental path. THE single copy of the parity-critical math."""
    x32 = x.astype(jnp.float32)
    v = v.astype(jnp.float32)
    x_start = jnp.sqrt(alpha) * x32 - jnp.sqrt(1.0 - alpha) * v
    x_noise = (
        jnp.sqrt(1.0 / alpha) * x32 - x_start
    ) / jnp.sqrt(1.0 / alpha - 1.0)
    x_pred = jnp.sqrt(alpha_next) * x_start + jnp.sqrt(1.0 - alpha_next) * x_noise
    return jnp.where(noise_idx <= 0, x_start, x_pred)


def denoise_step(
    dit_fn,
    x,
    actions,
    valid,
    noise_idx,
    stabilization_level,
    noise_range,
    alphas_cumprod,
    aux_call=False,
):
    """One DDIM-style v-prediction update of the window's last frame.

    x: (B, T, C, H, W) float32 window (context frames clean, last frame at
    noise level noise_range[noise_idx]); actions: (B, T, A) or None;
    valid: (T,) or (B, T) bool or None; noise_idx: int32 scalar (traced).
    Returns (x_pred, v_pred) — caller commits x_pred[:, -1:] only, exactly as
    the reference does (generate.py:220).
    """
    B, T = x.shape[:2]
    curr = noise_range[noise_idx]
    nxt = noise_range[jnp.maximum(noise_idx - 1, 0)]
    t_ctx = jnp.full((B, T - 1), stabilization_level, jnp.int32)
    t = jnp.concatenate([t_ctx, jnp.full((B, 1), curr, jnp.int32)], axis=1)
    t_next = jnp.concatenate([t_ctx, jnp.full((B, 1), nxt, jnp.int32)], axis=1)

    if aux_call:  # dit_fn returns (v, aux); aux rides along (PAB cache)
        v, aux = dit_fn(x, t, actions, valid)
    else:
        v, aux = dit_fn(x, t, actions, valid), None
    v = v.astype(jnp.float32)

    alpha = _expand(alphas_cumprod[t])
    alpha_next = _expand(alphas_cumprod[t_next])
    # context frames are already clean: force alpha_next=1 for them
    # (reference train_dit.py:116-117)
    alpha_next = jnp.concatenate(
        [jnp.ones_like(alpha_next[:, :-1]), alpha_next[:, -1:]], axis=1
    )
    x_out = _ddim_update(x, v, alpha, alpha_next, noise_idx)
    if aux_call:
        return x_out, v, aux
    return x_out, v


def denoise_window(
    dit_fn, x, actions, valid, cfg: SamplerConfig, alphas_cumprod,
    noise_range, cached=None, cond=None, incremental=None,
):
    """Run the full reversed noise-step scan on one window; returns
    (window with its last frame fully denoised, v-prediction of the final
    noise_idx==0 step) (reference generate.py:206-220; the final v feeds the
    debug grid in predict_noise, train_dit.py:535-550).

    cached: optional (collect_fn, reuse_fn, cache0) triple enabling
    attention broadcast (SamplerConfig.attn_broadcast). collect_fn(x, t, a,
    valid) -> (v, cache); reuse_fn(x, t, a, valid, cache) -> v.

    cond: optional (cond_fn, apply_fn) pair (params already bound) enabling
    the CONDITIONING CACHE: per step, t has T-1 constant stabilization rows
    plus a last row drawn from noise_range — so all adaLN head outputs for
    the whole scan are precomputed here (one weight stream instead of one
    per step; the adaLN heads are ~1/3 of DiT bytes) and gathered as scan
    xs. Bit-exact vs the plain path. cond_fn(t, a) -> mods pytree with rows
    per (B, T) slot; apply_fn(x, mods, valid) -> v.

    incremental: optional (prefill_fn, step_fn) pair (params bound; requires
    cond) enabling INCREMENTAL DECODING: only the last frame changes across
    the scan, so the context rows are prefilled once (per-block temporal K/V
    cache) and each step computes just the last frame (~1/T of the FLOPs) —
    gtax.models.dit.make_incremental_fns. Reference-exact semantics."""
    if cond is not None and (cached is None or cfg.attn_broadcast <= 1):
        cond_fn, apply_fn = cond
        B, T = x.shape[:2]
        steps = cfg.ddim_noise_steps
        # rows :-1 of the stabilization-level mods are the per-step constant
        # context rows (the last row of this call is unused)
        t_stab = jnp.full((B, T), cfg.stabilization_level, jnp.int32)
        mods_ctx = cond_fn(t_stab, actions)
        # last-row mods for every noise index, in scan order (steps -> 0);
        # computed as one (steps+1)*B row batch — row-wise exact
        idxs = jnp.arange(steps, -1, -1)
        S = steps + 1
        t_last = jnp.broadcast_to(
            noise_range[idxs].astype(jnp.int32)[:, None, None], (S, B, 1)
        ).reshape(S * B, 1)
        if actions is not None:
            a_last = jnp.broadcast_to(
                actions[None, :, -1:, :], (S, B, 1, actions.shape[-1])
            ).reshape(S * B, 1, actions.shape[-1])
        else:
            a_last = None
        mods_last = jax.tree.map(
            lambda m: m.reshape((S, B) + m.shape[1:]),
            cond_fn(t_last, a_last),
        )

        if incremental is not None:
            prefill_fn, step_fn = incremental
            mods_ctx_rows = jax.tree.map(lambda m: m[:, :-1], mods_ctx)
            valid_ctx = None if valid is None else valid[:-1]
            kv = prefill_fn(x[:, :-1], mods_ctx_rows, valid_ctx)

            def body(carry, inp):
                x_last, _ = carry  # (B, 1, C, H, W)
                noise_idx, m_last = inp
                v = step_fn(x_last, kv, m_last, valid).astype(jnp.float32)
                curr = noise_range[noise_idx]
                nxt = noise_range[jnp.maximum(noise_idx - 1, 0)]
                x_out = _ddim_update(
                    x_last, v, alphas_cumprod[curr], alphas_cumprod[nxt],
                    noise_idx,
                )
                return (x_out, v), None

            v0 = jnp.zeros_like(x[:, -1:])
            (x_last, v_last), _ = jax.lax.scan(
                body, (x[:, -1:], v0), (idxs, mods_last)
            )
            x = jnp.concatenate([x[:, :-1], x_last], axis=1)
            # context-row v is never computed in this mode (callers on the
            # rollout path discard v; renoise uses the plain path)
            v_full = jnp.concatenate(
                [jnp.zeros_like(x[:, :-1]), v_last], axis=1
            )
            return x, v_full

        def body(carry, inp):
            x_win, _ = carry
            noise_idx, m_last = inp
            mods = jax.tree.map(
                lambda w, l: jnp.concatenate([w[:, :-1], l], axis=1),
                mods_ctx, m_last,
            )
            call = lambda xx, tt, aa, vv: apply_fn(xx, mods, vv)  # noqa: E731
            x_pred, v = denoise_step(
                call, x_win, actions, valid, noise_idx,
                cfg.stabilization_level, noise_range, alphas_cumprod,
            )
            x_win = jnp.concatenate([x_win[:, :-1], x_pred[:, -1:]], axis=1)
            return (x_win, v), None

        v0 = jnp.zeros_like(x)
        (x, v_last), _ = jax.lax.scan(body, (x, v0), (idxs, mods_last))
        return x, v_last

    if cached is not None and cfg.attn_broadcast > 1:
        collect_fn, reuse_fn, cache0 = cached
        K = cfg.attn_broadcast
        steps = cfg.ddim_noise_steps

        def body(carry, k_iter):
            x_win, _, cache = carry
            noise_idx = steps - k_iter

            def fresh(x_win, cache):
                return denoise_step(
                    collect_fn, x_win, actions, valid, noise_idx,
                    cfg.stabilization_level, noise_range, alphas_cumprod,
                    aux_call=True,
                )

            def stale(x_win, cache):
                def call(xx, tt, aa, vv):
                    return reuse_fn(xx, tt, aa, vv, cache), cache

                return denoise_step(
                    call, x_win, actions, valid, noise_idx,
                    cfg.stabilization_level, noise_range, alphas_cumprod,
                    aux_call=True,
                )

            recompute = jnp.logical_or(k_iter % K == 0, noise_idx <= 0)
            x_pred, v, cache = jax.lax.cond(recompute, fresh, stale,
                                            x_win, cache)
            x_win = jnp.concatenate([x_win[:, :-1], x_pred[:, -1:]], axis=1)
            return (x_win, v, cache), None

        v0 = jnp.zeros_like(x)
        (x, v_last, _), _ = jax.lax.scan(
            body, (x, v0, cache0), jnp.arange(cfg.ddim_noise_steps + 1)
        )
        return x, v_last

    def body(carry, noise_idx):
        x_win, _ = carry
        x_pred, v = denoise_step(
            dit_fn, x_win, actions, valid, noise_idx,
            cfg.stabilization_level, noise_range, alphas_cumprod,
        )
        x_win = jnp.concatenate([x_win[:, :-1], x_pred[:, -1:]], axis=1)
        return (x_win, v), None

    idxs = jnp.arange(cfg.ddim_noise_steps, -1, -1)
    v0 = jnp.zeros_like(x)
    (x, v_last), _ = jax.lax.scan(body, (x, v0), idxs)
    return x, v_last


def make_rollout(dit_fn, max_frames: int, cfg: SamplerConfig, pab=None,
                 cond=None, incremental=None):
    """Build a jittable autoregressive rollout.

    dit_fn(params, x, t, actions, valid) -> v. Params are threaded through as
    a jit ARGUMENT — never a closure constant — so the compiled executable
    does not embed gigabytes of weights as literals.

    Returns rollout(params, prompt_latents, actions, rng, num_gen_frames,
    noise=None) -> (B, n_prompt + num_gen_frames, C, H, W) latents;
    num_gen_frames static. `noise`, if given, is a pre-drawn
    (B, num_gen_frames, C, H, W) tensor used for the fresh-frame latents
    instead of on-device RNG — reproducibility hook that lets the PSNR
    parity gate feed BOTH frameworks identical noise.

    The reference equivalent is the frame loop at generate.py:200-235; here it
    is a lax.scan whose carry is the (max_frames-1)-slot context buffer.

    pab: optional (collect_fn, reuse_fn, init_cache_fn) triple enabling
    attention broadcast when cfg.attn_broadcast > 1 —
    collect_fn(params, x, t, a, valid) -> (v, cache);
    reuse_fn(params, x, t, a, valid, cache) -> v;
    init_cache_fn(params, B, T) -> zero cache pytree.

    cond: optional (cond_fn, apply_fn) pair (gtax.models.dit.make_cond_fns)
    enabling the bit-exact conditioning cache (see denoise_window); used on
    the exact path (ignored when attention broadcast is active).

    incremental: optional (prefill_fn, step_fn) pair
    (gtax.models.dit.make_incremental_fns; requires cond) enabling
    incremental decoding — per-frame context prefill + last-frame-only
    denoise steps over a temporal K/V cache. Reference-exact semantics.
    """
    abar, noise_range = cfg.tables()
    W = max_frames

    @partial(jax.jit, static_argnames=("num_gen_frames",))
    def rollout(params, prompt_latents, actions, rng, num_gen_frames: int,
                noise=None):
        bound_dit = lambda x, t, a, v: dit_fn(params, x, t, a, v)  # noqa: E731
        B, n_prompt, C, H, Wd = prompt_latents.shape
        assert n_prompt >= 1
        # context buffer: last W-1 frames, left-padded with zeros. float32 by
        # the denoise_step contract — and the scan carry must keep one dtype
        # (each step's new frame is a float32 _ddim_update output)
        prompt_latents = prompt_latents.astype(jnp.float32)
        n_ctx = min(n_prompt, W - 1)
        ctx = prompt_latents[:, n_prompt - n_ctx:]
        if n_ctx < W - 1:
            pad = jnp.zeros((B, W - 1 - n_ctx, C, H, Wd), jnp.float32)
            ctx = jnp.concatenate([pad, ctx], axis=1)

        if actions is not None:
            # actions: (B, total, A); front-pad W-1 so window slice is static-size
            A = actions.shape[-1]
            actions_padded = jnp.concatenate(
                [jnp.zeros((B, W - 1, A), actions.dtype), actions], axis=1
            )
        else:
            actions_padded = None

        def step(carry, s):
            ctx_buf, key = carry
            i = n_prompt + s  # absolute index of the frame being generated
            key, sub = jax.random.split(key)
            if noise is None:
                fresh = jnp.clip(
                    jax.random.normal(sub, (B, 1, C, H, Wd), jnp.float32),
                    -cfg.noise_abs_max,
                    cfg.noise_abs_max,
                )
            else:
                fresh = jax.lax.dynamic_slice(
                    noise, (0, s, 0, 0, 0), (B, 1, C, H, Wd)
                ).astype(jnp.float32)
            window = jnp.concatenate([ctx_buf, fresh], axis=1)  # (B, W, ...)
            # slot j holds frame i - (W-1) + j; valid iff that index >= 0
            valid = (jnp.arange(W) + i - (W - 1)) >= 0
            if actions_padded is not None:
                awin = jax.lax.dynamic_slice(
                    actions_padded, (0, i, 0), (B, W, actions_padded.shape[-1])
                )
            else:
                awin = None
            if pab is not None and cfg.attn_broadcast > 1:
                collect_fn, reuse_fn, init_cache_fn = pab
                cached = (
                    lambda x, t, a, v: collect_fn(params, x, t, a, v),
                    lambda x, t, a, v, cc: reuse_fn(params, x, t, a, v, cc),
                    init_cache_fn(params, B, W),
                )
            else:
                cached = None
            if cond is not None:
                bound_cond = (
                    lambda t_, a_: cond[0](params, t_, a_),
                    lambda x_, m_, v_: cond[1](params, x_, m_, v_),
                )
            else:
                bound_cond = None
            if incremental is not None and cond is not None:
                bound_inc = (
                    lambda xc, mc, vc: incremental[0](params, xc, mc, vc),
                    lambda xl, kv, ml, vv: incremental[1](params, xl, kv,
                                                          ml, vv),
                )
            else:
                bound_inc = None
            window, _ = denoise_window(
                bound_dit, window, awin, valid, cfg, abar, noise_range,
                cached=cached, cond=bound_cond, incremental=bound_inc,
            )
            new_frame = window[:, -1]
            ctx_buf = jnp.concatenate([ctx_buf[:, 1:], window[:, -1:]], axis=1)
            return (ctx_buf, key), new_frame

        (_, _), frames = jax.lax.scan(
            step, (ctx, rng), jnp.arange(num_gen_frames)
        )
        frames = jnp.moveaxis(frames, 0, 1)  # (B, num_gen, C, H, W)
        return jnp.concatenate([prompt_latents, frames], axis=1)

    return rollout


def renoise_last_frame(
    dit_fn, latents, actions, rng, cfg: SamplerConfig, alphas_cumprod, noise_range
):
    """Eval diagnostic: stabilise-noise the context, replace the last frame
    with pure noise, denoise it (reference predict_noise, train_dit.py:466-552
    — note it noises context at stabilization_level - 1).

    Returns a dict of everything the reference's debug grid shows
    (utils.py:104-211): denoised window, the initial noisy window, the noise
    actually applied, and the v-prediction of the final denoise step.
    """
    B, T, C, H, W = latents.shape
    k1, k2 = jax.random.split(rng)
    ctx_noise = jnp.clip(
        jax.random.normal(k1, (B, T - 1, C, H, W), jnp.float32),
        -cfg.noise_abs_max, cfg.noise_abs_max,
    )
    t_ctx = jnp.full((B, T - 1), cfg.stabilization_level - 1, jnp.int32)
    a = _expand(alphas_cumprod[t_ctx])
    noisy_ctx = jnp.sqrt(a) * latents[:, :-1] + jnp.sqrt(1.0 - a) * ctx_noise
    new_frame = jnp.clip(
        jax.random.normal(k2, (B, 1, C, H, W), jnp.float32),
        -cfg.noise_abs_max, cfg.noise_abs_max,
    )
    x_noisy = jnp.concatenate([noisy_ctx, new_frame], axis=1)
    denoised, v_last = denoise_window(
        dit_fn, x_noisy, actions, None, cfg, alphas_cumprod, noise_range
    )
    return {
        "denoised": denoised,
        "x_noisy": x_noisy,
        "noise": jnp.concatenate([ctx_noise, new_frame], axis=1),
        "v": v_last,
    }


def make_pipelined_rollout(dit_fn, max_frames: int, cfg: SamplerConfig,
                           pipeline_depth: int = 4, pab=None, cond=None,
                           incremental=None):
    """Pyramid-pipelined autoregressive rollout: up to `pipeline_depth` frames
    are in flight simultaneously at staggered noise levels, so each DiT call
    advances P frames by one DDIM step instead of one — ~P times fewer model
    calls per generated frame than the reference scheme, with every frame
    still traversing the full noise_steps DDIM trajectory.

    Why this is sound for diffusion forcing: the model is TRAINED with
    noisy context frames (per-frame noise indices sampled up to
    ctx_max_noise_idx — reference train_dit.py:573-587) and conditions on a
    per-frame noise level embedding, so windows whose context is mid-denoise
    are in-distribution. Causal temporal attention guarantees each in-flight
    frame only attends to older (less-noisy) frames. pipeline_depth trades
    context cleanliness for speed:
      P=1  == the reference scheme (4 clean context frames);
      P=4  == 1 clean + 4 in-flight (fastest).

    pab: optional (collect_fn, reuse_fn, init_cache_fn) enabling attention
    broadcast (cfg.attn_broadcast > 1) WITHIN each cycle: the window's frame
    identities are fixed for a cycle's `stride` inner DiT calls, so cached
    attention deltas stay aligned; the cache resets every cycle and the
    first and last inner calls always recompute. Composes multiplicatively
    with pipelining.

    cond + incremental: the conditioning cache and incremental-decoding fns
    (gtax.models.dit.make_cond_fns / make_incremental_fns — same contracts
    as make_rollout). The context slots are FIXED within a cycle's `stride`
    inner calls (their latents, actions, and stabilization-level adaLN rows
    don't change), so each cycle prefills the n_ctx_slots context rows ONCE
    (per-block temporal K/V cache) and every inner call computes only the P
    in-flight rows — dit_apply_step with Tl=P live slots. All in-flight
    adaLN rows for the cycle are precomputed in one dit_cond batch and fed
    as scan xs. Per-call v for the in-flight rows is kernel-for-kernel
    identical to the full-window path's, so the trajectory is unchanged.
    Mutually exclusive with pab (the attention-broadcast cache holds
    full-window deltas).

    Returns rollout(params, prompt_latents, actions, rng, num_gen_frames).
    """
    abar, noise_range = cfg.tables()
    W = max_frames
    P = pipeline_depth
    # at least one clean-context slot must remain (P == W would leave the
    # window with no emitted/prompt context at all)
    assert 1 <= P <= W - 1, (P, W)
    assert incremental is None or cond is not None, (
        "incremental pipelined decoding requires the conditioning cache")
    assert incremental is None or pab is None or cfg.attn_broadcast <= 1, (
        "incremental pipelined decoding and attention broadcast are "
        "mutually exclusive")
    steps = cfg.ddim_noise_steps
    stride = -(-(steps + 1) // P)  # ceil: calls per emitted frame
    n_ctx_slots = W - P

    @partial(jax.jit, static_argnames=("num_gen_frames",))
    def rollout(params, prompt_latents, actions, rng, num_gen_frames: int):
        bound_dit = lambda x, t, a, v: dit_fn(params, x, t, a, v)  # noqa: E731
        B, n_prompt, C, H, Wd = prompt_latents.shape
        prompt_latents = prompt_latents.astype(jnp.float32)  # carry dtype
        n_cycles = num_gen_frames + P - 1

        # clean-context buffer: last n_ctx_slots prompt frames, left-padded.
        # This is the POST-warm-up carry; warm-up cycles (c < P-1) instead
        # slice the prompt at the window's true frame positions (see cycle)
        n_fill = min(n_prompt, n_ctx_slots)
        ctx = prompt_latents[:, n_prompt - n_fill:]
        ctx_valid0 = jnp.asarray(
            [False] * (n_ctx_slots - n_fill) + [True] * n_fill
        )
        if n_fill < n_ctx_slots:
            pad = jnp.zeros((B, n_ctx_slots - n_fill, C, H, Wd), jnp.float32)
            ctx = jnp.concatenate([pad, ctx], axis=1)
        # prompt buffer for warm-up context slices: frame f lives at index
        # f + W (front pad W covers the most negative base, back pad
        # n_ctx_slots covers the highest slice end)
        prompt_pad = jnp.concatenate(
            [jnp.zeros((B, W, C, H, Wd), jnp.float32), prompt_latents,
             jnp.zeros((B, n_ctx_slots, C, H, Wd), jnp.float32)], axis=1)

        if actions is not None:
            A = actions.shape[-1]
            # front pad W-1 (left context), back pad P (in-flight frames near
            # the end of the rollout overshoot the action horizon; their
            # outputs are discarded)
            actions_padded = jnp.concatenate(
                [
                    jnp.zeros((B, W - 1, A), actions.dtype),
                    actions,
                    jnp.zeros((B, P, A), actions.dtype),
                ],
                axis=1,
            )
        else:
            actions_padded = None

        inflight0 = jnp.zeros((B, P, C, H, Wd), jnp.float32)
        slot_ids = jnp.arange(P)

        def cycle(carry, c):
            ctx, ctx_valid, inflight, key = carry
            key, sub = jax.random.split(key)
            fresh = jnp.clip(
                jax.random.normal(sub, (B, 1, C, H, Wd), jnp.float32),
                -cfg.noise_abs_max, cfg.noise_abs_max,
            )
            inflight = jnp.concatenate([inflight[:, 1:], fresh], axis=1)
            # in-flight slot k active iff its frame has started: slot k's
            # frame is emitted at cycle c + k, so it is active when
            # c + k <= n_cycles - 1 AND it entered (cycle c - (P-1-k) >= 0)
            active = (c - (P - 1 - slot_ids)) >= 0
            # window slot j nominally holds frame base + j: during warm-up
            # (c < P-1) the carried ctx is NOT yet aligned to that (it holds
            # the newest prompt frames; shifting only starts once frames
            # emit), so slice the prompt at the true positions instead —
            # otherwise the first P-1 generated frames attend to a context
            # latent at the wrong temporal-RoPE distance, conditioned on the
            # wrong frame's action
            base = n_prompt + c - (P - 1) - n_ctx_slots
            ctx_win, ctx_valid_win = ctx, ctx_valid  # window view, NOT carry
            if P > 1:
                warm_ctx = jax.lax.dynamic_slice(
                    prompt_pad, (0, base + W, 0, 0, 0),
                    (B, n_ctx_slots, C, H, Wd))
                fidx = base + jnp.arange(n_ctx_slots)
                warm_valid = (fidx >= 0) & (fidx < n_prompt)
                warm = c < (P - 1)
                ctx_win = jnp.where(warm, warm_ctx, ctx)
                ctx_valid_win = jnp.where(warm, warm_valid, ctx_valid)
            # window frame index base (for actions): emitted frame of this
            # cycle is n_prompt + c - (P-1); window slot j holds frame
            # base + j with base as below, offset into the front-padded array
            if actions_padded is not None:
                awin = jax.lax.dynamic_slice(
                    actions_padded, (0, base + (W - 1), 0),
                    (B, W, actions_padded.shape[-1]),
                )
            else:
                awin = None
            valid = jnp.concatenate([ctx_valid_win, active])

            use_pab = pab is not None and cfg.attn_broadcast > 1
            use_inc = incremental is not None

            if use_inc:
                cond_fn = cond[0]
                prefill_fn, step_fn = incremental[0], incremental[1]
                # context rows are cycle-invariant: prefill their per-block
                # temporal K/V once (stabilization-level adaLN rows included)
                t_ctx_rows = jnp.full((B, n_ctx_slots),
                                      cfg.stabilization_level, jnp.int32)
                a_ctx = None if awin is None else awin[:, :n_ctx_slots]
                mods_ctx = cond_fn(params, t_ctx_rows, a_ctx)
                kv = prefill_fn(params, ctx_win, mods_ctx, ctx_valid_win)
                # every inner call's in-flight adaLN rows in ONE cond batch,
                # gathered as scan xs (noise levels are call-indexed, actions
                # are cycle-fixed)
                ps = jnp.arange(stride - 1, -1, -1)
                raw_all = slot_ids[None, :] * stride + ps[:, None]
                t_all = noise_range[
                    jnp.clip(raw_all, 0, steps)
                ].astype(jnp.int32)  # (stride, P)
                t_flat = jnp.broadcast_to(
                    t_all[:, None, :], (stride, B, P)
                ).reshape(stride * B, P)
                if awin is not None:
                    a_live = jnp.broadcast_to(
                        awin[None, :, n_ctx_slots:, :],
                        (stride, B, P, awin.shape[-1]),
                    ).reshape(stride * B, P, awin.shape[-1])
                else:
                    a_live = None
                mods_live = jax.tree.map(
                    lambda m: m.reshape((stride, B) + m.shape[1:]),
                    cond_fn(params, t_flat, a_live),
                )
            else:
                mods_live = jnp.zeros((stride,), jnp.float32)  # unused xs

            def call(carry2, p_k):
                inflight2, cache = carry2
                p, k_iter, m_p = p_k
                raw = slot_ids * stride + p
                # a slot whose raw index overshoots the schedule top has not
                # started denoising this cycle: it idles at pure noise (the
                # clipped update would re-apply the steps->steps-1 step
                # P*stride-(steps+1) extra times at a mismatched level)
                started = raw <= steps
                idxs = jnp.clip(raw, 0, steps)
                t_infl = noise_range[idxs]  # (P,)
                if use_inc:
                    v_infl = step_fn(params, inflight2, kv, m_p,
                                     valid).astype(jnp.float32)
                else:
                    t = jnp.concatenate(
                        [
                            jnp.full((B, n_ctx_slots),
                                     cfg.stabilization_level, jnp.int32),
                            jnp.broadcast_to(t_infl[None, :], (B, P)).astype(
                                jnp.int32
                            ),
                        ],
                        axis=1,
                    )
                    window = jnp.concatenate([ctx_win, inflight2], axis=1)
                    if use_pab:
                        collect_fn, reuse_fn, _ = pab

                        def fresh(window, t, cache):
                            return collect_fn(params, window, t, awin, valid)

                        def stale(window, t, cache):
                            return (
                                reuse_fn(params, window, t, awin, valid,
                                         cache),
                                cache,
                            )

                        recompute = jnp.logical_or(
                            k_iter % cfg.attn_broadcast == 0,
                            k_iter == stride - 1,
                        )
                        v, cache = jax.lax.cond(recompute, fresh, stale,
                                                window, t, cache)
                        v = v.astype(jnp.float32)
                    else:
                        v = bound_dit(window, t, awin,
                                      valid).astype(jnp.float32)
                    v_infl = v[:, n_ctx_slots:]
                a_t = abar[t_infl][None, :, None, None, None]
                x = inflight2.astype(jnp.float32)
                x_start = jnp.sqrt(a_t) * x - jnp.sqrt(1 - a_t) * v_infl
                x_noise = (jnp.sqrt(1 / a_t) * x - x_start) / jnp.sqrt(
                    1 / a_t - 1
                )
                idx_next = jnp.clip(idxs - 1, 0, steps)
                a_n = abar[noise_range[idx_next]][None, :, None, None, None]
                x_pred = jnp.sqrt(a_n) * x_start + jnp.sqrt(1 - a_n) * x_noise
                final = (idxs <= 0)[None, :, None, None, None]
                x_out = jnp.where(final, x_start, x_pred)
                x_out = jnp.where(started[None, :, None, None, None],
                                  x_out, x)
                return (x_out, cache), None

            cache0 = (
                pab[2](params, B, W) if use_pab else jnp.zeros((), jnp.float32)
            )
            (inflight, _), _ = jax.lax.scan(
                call, (inflight, cache0),
                (jnp.arange(stride - 1, -1, -1), jnp.arange(stride),
                 mods_live),
            )
            emitted = inflight[:, 0]
            # emitted frames only become context once real (post warm-up)
            emit_ok = c >= (P - 1)
            new_ctx = jnp.concatenate([ctx[:, 1:], inflight[:, :1]], axis=1)
            new_ctx_valid = jnp.concatenate(
                [ctx_valid[1:], jnp.asarray([True])]
            )
            ctx = jnp.where(emit_ok, new_ctx, ctx)
            ctx_valid = jnp.where(emit_ok, new_ctx_valid, ctx_valid)
            return (ctx, ctx_valid, inflight, key), emitted

        (_, _, _, _), emitted = jax.lax.scan(
            cycle, (ctx, ctx_valid0, inflight0, rng), jnp.arange(n_cycles)
        )
        frames = jnp.moveaxis(emitted[P - 1:], 0, 1)  # drop warm-up output
        return jnp.concatenate([prompt_latents, frames], axis=1)

    return rollout


# --------------------------------------------------------------- training loss


@dataclasses.dataclass(frozen=True)
class LossConfig:
    ddim_noise_steps: int = 50
    ctx_max_noise_idx: int = 40
    noise_abs_max: float = NOISE_ABS_MAX
    n_prompt_frames: int = 4
    max_frames: int = 5
    max_noise_level: int = MAX_NOISE_LEVEL


def diffusion_forcing_loss(dit_fn, latents, actions, rng, cfg: LossConfig,
                           alphas_cumprod, noise_range):
    """Diffusion-forcing v-prediction loss over a clip.

    latents: (B, T, C, H, W) float32 (already VAE-encoded and scaled);
    actions: (B, T, A) or None. Returns (mean_loss, sum_loss) where mean is
    the reference's reported loss (frame-mean, train_dit.py:682) and sum is
    what gradients should flow through (the reference backprops each frame's
    loss separately, :678-680 — summing is the functional equivalent).

    Per generated frame i (reference :573-650):
      target noise idx ~ U[1, ddim_noise_steps], ctx idx ~ U[1, ctx_max]
      clipped to target; context frames noised at noise_range[ctx_idx], last
      frame at noise_range[target_idx]; v-target = sqrt(a)*eps -
      sqrt(1-a)*x0; MSE on the last frame only.
    """
    B, T, C, H, W = latents.shape
    n_gen = T - cfg.n_prompt_frames
    assert n_gen >= 1
    Wn = cfg.max_frames

    k_t, k_c, k_noise = jax.random.split(rng, 3)
    target_idx = jax.random.randint(
        k_t, (n_gen, B), 1, cfg.ddim_noise_steps + 1
    )
    ctx_idx = jax.random.randint(k_c, (n_gen, B), 1, cfg.ctx_max_noise_idx + 1)
    ctx_idx = jnp.minimum(ctx_idx, target_idx)

    if actions is not None:
        A = actions.shape[-1]
        actions_padded = jnp.concatenate(
            [jnp.zeros((B, Wn - 1, A), actions.dtype), actions], axis=1
        )

    total = jnp.float32(0.0)
    for idx, i in enumerate(range(cfg.n_prompt_frames, T)):
        # static window build: slots hold frames i-(Wn-1)..i, left zero-padded
        lo = i - (Wn - 1)
        if lo < 0:
            pad = jnp.zeros((B, -lo, C, H, W), latents.dtype)
            window = jnp.concatenate([pad, latents[:, : i + 1]], axis=1)
        else:
            window = latents[:, lo : i + 1]
        valid = jnp.asarray(
            [lo + j >= 0 for j in range(Wn)], dtype=bool
        )
        if actions is not None:
            awin = actions_padded[:, lo + (Wn - 1) : lo + (Wn - 1) + Wn]
        else:
            awin = None

        t_ctx = noise_range[ctx_idx[idx]][:, None]  # (B,1) broadcast over ctx
        t_tgt = noise_range[target_idx[idx]][:, None]
        t = jnp.concatenate(
            [jnp.broadcast_to(t_ctx, (B, Wn - 1)), t_tgt], axis=1
        ).astype(jnp.int32)

        kf = jax.random.fold_in(k_noise, idx)
        k_ctx, k_last = jax.random.split(kf)
        ctx_noise = jnp.clip(
            jax.random.normal(k_ctx, (B, Wn - 1, C, H, W), jnp.float32),
            -cfg.noise_abs_max, cfg.noise_abs_max,
        )
        last_noise = jnp.clip(
            jax.random.normal(k_last, (B, 1, C, H, W), jnp.float32),
            -cfg.noise_abs_max, cfg.noise_abs_max,
        )
        a_ctx = _expand(alphas_cumprod[t[:, :-1]])
        a_tgt = _expand(alphas_cumprod[t[:, -1:]])
        noisy_ctx = jnp.sqrt(a_ctx) * window[:, :-1] + jnp.sqrt(1 - a_ctx) * ctx_noise
        noisy_tgt = jnp.sqrt(a_tgt) * window[:, -1:] + jnp.sqrt(1 - a_tgt) * last_noise
        x_noisy = jnp.concatenate([noisy_ctx, noisy_tgt], axis=1)
        v_target = (
            jnp.sqrt(a_tgt) * last_noise - jnp.sqrt(1 - a_tgt) * window[:, -1:]
        )

        v_pred = dit_fn(x_noisy, t, awin, valid).astype(jnp.float32)
        total = total + jnp.mean(jnp.square(v_pred[:, -1:] - v_target))

    return total / n_gen, total
