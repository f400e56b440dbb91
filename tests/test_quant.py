"""W8A8 int8 serving-quantization tests (gtax.kernels.quant +
gtax.models.dit.quantize_for_inference).

Quantization is an approximation, so these are TOLERANCE tests against the
fp32 XLA path, not golden tests: per-output-channel int8 weights bound the
per-GEMM relative error, and the full small-DiT forward must stay within a
small relative L2 of the exact forward. Reference semantics target:
SpatioTemporalDiTBlock (/root/reference/model/dit.py:200-225)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtax.kernels.quant import quantize_weight
from gtax.models.dit import (
    dit_apply,
    dit_init,
    quantize_for_inference,
    unstack_for_inference,
)
from gtax.nn.branches import (
    xla_mlp_branch,
    xla_spatial_branch,
    xla_temporal_branch,
)
from tests.test_models_parity import DIT_SMALL


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / np.linalg.norm(b)


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.1
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8
    assert s.shape == (1, 128)
    deq = q.astype(jnp.float32) * s
    # symmetric per-channel int8: error bounded by half a quantization step
    step = np.asarray(s)[0]
    assert np.all(np.abs(np.asarray(deq - w)) <= 0.5 * step + 1e-8)
    # stacked variant quantizes per block
    ws = jnp.stack([w, 10.0 * w])
    qs, ss = quantize_weight(ws)
    assert ss.shape == (2, 1, 128)
    np.testing.assert_allclose(np.asarray(ss[1]), 10.0 * np.asarray(ss[0]),
                               rtol=1e-6)


@pytest.fixture(scope="module")
def branch_inputs():
    key = jax.random.PRNGKey(3)
    N, S, D = 5, 48, 64
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (N, S, D))
    shift = jax.random.normal(ks[1], (N, D)) * 0.1
    scale = jax.random.normal(ks[2], (N, D)) * 0.1
    g = jax.random.normal(ks[3], (N, D)) * 0.5
    qkv_w = jax.random.normal(ks[4], (D, 3 * D)) * 0.05
    out_w = jax.random.normal(ks[5], (D, D)) * 0.05
    out_b = jax.random.normal(ks[6], (D,)) * 0.01
    return x, shift, scale, g, qkv_w, out_w, out_b


def test_spatial_branch_q_close_to_xla(branch_inputs):
    from gtax.kernels.quant import fused_spatial_branch_q

    x, shift, scale, g, qkv_w, out_w, out_b = branch_inputs
    N, S, D = x.shape
    num_heads = 2
    freqs = jax.random.normal(jax.random.PRNGKey(9), (S, D // num_heads))
    ref = xla_spatial_branch(x, shift, scale, g, qkv_w, out_w, out_b, freqs,
                             num_heads, jnp.float32)
    qkv_q, qkv_s = quantize_weight(qkv_w)
    out_q, out_s = quantize_weight(out_w)
    got = fused_spatial_branch_q(x, shift, scale, g, qkv_q, qkv_s, out_q,
                                 out_s, out_b, freqs, num_heads)
    assert _rel(got, ref) < 5e-3


@pytest.mark.parametrize("has_valid", [False, True])
def test_temporal_branch_q_close_to_xla(branch_inputs, has_valid):
    from gtax.kernels.quant import fused_temporal_branch_q

    x, shift, scale, g, qkv_w, out_w, out_b = branch_inputs
    N, S, D = x.shape
    T, num_heads = N, 2
    freqs = jax.random.normal(jax.random.PRNGKey(10), (T, D // num_heads))
    valid = jnp.array([False, True, True, True, True]) if has_valid else None
    ref = xla_temporal_branch(x, shift, scale, g, qkv_w, out_w, out_b, freqs,
                              valid, num_heads, T, jnp.float32)
    qkv_q, qkv_s = quantize_weight(qkv_w)
    out_q, out_s = quantize_weight(out_w)
    got = fused_temporal_branch_q(x, shift, scale, g, qkv_q, qkv_s, out_q,
                                  out_s, out_b, freqs, valid, num_heads, T)
    assert _rel(got, ref) < 5e-3


def test_mlp_branch_q_close_to_xla(branch_inputs):
    from gtax.kernels.quant import fused_mlp_branch_q

    x, shift, scale, g, _, _, _ = branch_inputs
    N, S, D = x.shape
    H = 4 * D
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    w1 = jax.random.normal(ks[0], (D, H)) * 0.05
    b1 = jax.random.normal(ks[1], (H,)) * 0.01
    w2 = jax.random.normal(ks[2], (H, D)) * 0.05
    b2 = jax.random.normal(ks[3], (D,)) * 0.01
    ref = xla_mlp_branch(x, shift, scale, g, w1, b1, w2, b2, jnp.float32)
    w1_q, w1_s = quantize_weight(w1)
    w2_q, w2_s = quantize_weight(w2)
    got = fused_mlp_branch_q(x, shift, scale, g, w1_q, w1_s, b1, w2_q, w2_s,
                             b2)
    assert _rel(got, ref) < 5e-3


@pytest.fixture(scope="module")
def random_dit_params():
    """dit_init zero-inits the adaLN heads (gates 0 => branches contribute
    nothing), so quantization error would be invisible; randomize every leaf
    to make the whole-model tolerance test non-degenerate."""
    params = jax.jit(lambda k: dit_init(k, DIT_SMALL))(jax.random.PRNGKey(0))
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    leaves = [
        jax.random.normal(k, l.shape, l.dtype) * 0.05
        if jnp.issubdtype(l.dtype, jnp.floating) else l
        for k, l in zip(keys, leaves)
    ]
    return jax.tree.unflatten(treedef, leaves)


def test_quantized_dit_forward(random_dit_params):
    params = random_dit_params
    B, T = 1, 5
    C, H, W = DIT_SMALL.in_channels, DIT_SMALL.input_h, DIT_SMALL.input_w
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C, H, W))
    t = jnp.full((B, T), 10, jnp.int32)
    a = jax.random.normal(jax.random.PRNGKey(2), (B, T, 25))

    ref = dit_apply(params, DIT_SMALL, x, t, a, None,
                    compute_dtype=jnp.float32)
    out_s = dit_apply(quantize_for_inference(params, DIT_SMALL), DIT_SMALL,
                      x, t, a, None, compute_dtype=jnp.float32)
    unstacked = quantize_for_inference(
        unstack_for_inference(params, DIT_SMALL), DIT_SMALL)
    out_u = dit_apply(unstacked, DIT_SMALL, x, t, a, None,
                      compute_dtype=jnp.float32)

    assert _rel(out_s, ref) < 2e-2  # measured 3.3e-3 at depth 2
    # stacked-scan and unstacked-loop quantized paths agree to int8-rounding
    # noise: the chunk-streaming MLP kernel's fp32 rescale can reassociate
    # differently between the scan and inlined call sites, flipping an
    # occasional jnp.round by one int8 step (~5e-5 observed on <0.1% of
    # elements); the quality gate is the fp32 bound above
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u),
                               atol=1e-3, rtol=1e-3)


def test_quantized_rollout_smoke(random_dit_params):
    """Quantized params drive the full sampler (window masks exercise the
    valid-path of the temporal kernel via short prompts)."""
    from gtax.sampling import diffusion as sd

    params = quantize_for_inference(
        unstack_for_inference(random_dit_params, DIT_SMALL), DIT_SMALL)

    def dit_fn(p, x, t, a, v=None):
        return dit_apply(p, DIT_SMALL, x, t, a, v, compute_dtype=jnp.float32)

    cfg = sd.SamplerConfig(ddim_noise_steps=3, stabilization_level=15)
    B, C, H, W = 1, DIT_SMALL.in_channels, DIT_SMALL.input_h, DIT_SMALL.input_w
    prompt = jax.random.normal(jax.random.PRNGKey(5), (B, 2, C, H, W))
    actions = jax.random.normal(jax.random.PRNGKey(6), (B, 6, 25))
    out = sd.make_rollout(dit_fn, 5, cfg)(
        params, prompt, actions, jax.random.PRNGKey(0), num_gen_frames=4)
    assert out.shape == (B, 6, C, H, W)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_quantized_cond_cache_rollout(random_dit_params):
    """Conditioning cache under int8 W8A8 params: dynamic per-row activation
    quantization is row-independent, so the cached adaLN outputs match the
    per-step ones and the rollout agrees with the uncached quantized path."""
    from gtax.models.dit import make_cond_fns
    from gtax.sampling import diffusion as sd

    params = quantize_for_inference(
        unstack_for_inference(random_dit_params, DIT_SMALL), DIT_SMALL)

    def dit_fn(p, x, t, a, v=None):
        return dit_apply(p, DIT_SMALL, x, t, a, v, compute_dtype=jnp.float32)

    cfg = sd.SamplerConfig(ddim_noise_steps=3, stabilization_level=15)
    B, C, H, W = 1, DIT_SMALL.in_channels, DIT_SMALL.input_h, DIT_SMALL.input_w
    prompt = jax.random.normal(jax.random.PRNGKey(5), (B, 2, C, H, W))
    actions = jax.random.normal(jax.random.PRNGKey(6), (B, 6, 25))
    plain = sd.make_rollout(dit_fn, 5, cfg)(
        params, prompt, actions, jax.random.PRNGKey(0), num_gen_frames=4)
    cond = make_cond_fns(DIT_SMALL, jnp.float32)
    cached = sd.make_rollout(dit_fn, 5, cfg, cond=cond)(
        params, prompt, actions, jax.random.PRNGKey(0), num_gen_frames=4)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(plain),
                               atol=1e-5, rtol=1e-5)


def test_quantized_incremental_rollout(random_dit_params):
    """Incremental decoding (context prefill + last-frame-only steps over
    the temporal K/V cache) under int8: row-count-dependent fp noise flips
    occasional int8 roundings, so plain/incremental aren't bitwise equal —
    assert instead that the incremental rollout is exactly as accurate
    against the fp32 reference as the plain quantized rollout, and close to
    it in absolute terms."""
    from gtax.models.dit import make_cond_fns, make_incremental_fns
    from gtax.sampling import diffusion as sd

    unstacked = unstack_for_inference(random_dit_params, DIT_SMALL)
    params = quantize_for_inference(unstacked, DIT_SMALL)

    def dit_fn(p, x, t, a, v=None):
        return dit_apply(p, DIT_SMALL, x, t, a, v, compute_dtype=jnp.float32)

    cfg = sd.SamplerConfig(ddim_noise_steps=3, stabilization_level=15)
    B, C, H, W = 1, DIT_SMALL.in_channels, DIT_SMALL.input_h, DIT_SMALL.input_w
    prompt = jax.random.normal(jax.random.PRNGKey(5), (B, 2, C, H, W))
    actions = jax.random.normal(jax.random.PRNGKey(6), (B, 6, 25))
    cond = make_cond_fns(DIT_SMALL, jnp.float32)
    fp32 = sd.make_rollout(dit_fn, 5, cfg)(
        unstacked, prompt, actions, jax.random.PRNGKey(0), num_gen_frames=4)
    plain = sd.make_rollout(dit_fn, 5, cfg, cond=cond)(
        params, prompt, actions, jax.random.PRNGKey(0), num_gen_frames=4)
    inc = make_incremental_fns(DIT_SMALL, jnp.float32)
    fast = sd.make_rollout(dit_fn, 5, cfg, cond=cond, incremental=inc)(
        params, prompt, actions, jax.random.PRNGKey(0), num_gen_frames=4)

    def rel(a, b):
        return float(jnp.linalg.norm((a - b).ravel())
                     / jnp.linalg.norm(b.ravel()))

    e_plain = rel(plain, fp32)   # measured 1.93e-3
    e_fast = rel(fast, fp32)     # measured 1.94e-3
    assert e_fast < e_plain * 1.1 + 1e-6, (e_fast, e_plain)
    assert rel(fast, plain) < 1e-3  # measured 5.3e-4 (quant rounding flips)


@pytest.mark.parametrize("B,Tl", [(2, 1), (2, 2), (4, 1)])
def test_quantized_step_matches_full(random_dit_params, B, Tl):
    """Quantized incremental step vs the full quantized forward's live rows
    across live-row counts spanning BOTH serving kernel paths: N <= 2 takes
    the paired attn+MLP kernels, N > 2 the sequential fallback
    (gtax.models.dit._PAIR_MAX_FRAMES gate). The two must agree with the
    full-window forward either way."""
    from gtax.models.dit import (dit_apply, dit_apply_step, dit_cond,
                                 dit_prefill, quantize_for_inference,
                                 unstack_for_inference)
    from gtax.nn import attention as nnattn

    params = quantize_for_inference(
        unstack_for_inference(random_dit_params, DIT_SMALL), DIT_SMALL)
    T = DIT_SMALL.max_frames
    C, H, W = DIT_SMALL.in_channels, DIT_SMALL.input_h, DIT_SMALL.input_w
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C, H, W)) * 0.3
    t = jnp.concatenate(
        [jnp.full((B, T - Tl), 15, jnp.int32),
         jnp.full((B, Tl), 40, jnp.int32)], axis=1)
    a = jax.random.normal(jax.random.PRNGKey(2), (B, T, 25))
    valid = jnp.asarray([False] + [True] * (T - 1))

    nnattn.set_backend("fused")
    try:
        ref = dit_apply(params, DIT_SMALL, x, t, a, valid,
                        compute_dtype=jnp.float32)
        mods = dit_cond(params, DIT_SMALL, t, a, jnp.float32)
        mods_ctx = jax.tree.map(lambda m: m[:, :-Tl], mods)
        kv = dit_prefill(params, DIT_SMALL, x[:, :-Tl], mods_ctx,
                         valid[:-Tl], jnp.float32)
        mods_last = jax.tree.map(lambda m: m[:, -Tl:], mods)
        out = dit_apply_step(params, DIT_SMALL, x[:, -Tl:], kv, mods_last,
                             valid, jnp.float32)
    finally:
        nnattn.set_backend("xla")
    # int8 dynamic-quant rounding can flip by one step between the row
    # counts (documented above); tolerance, not equality
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[:, -Tl:]),
                               atol=2e-3, rtol=2e-3)


# ---------------------------------------------------------------- int8 fwd
# int8 TRAINING forward (gtax.nn.branches quant=True wrappers): the primal
# runs the W8A8 kernels, the backward is the unchanged bf16 residual path
# over the int8 forward's actual residuals (straight-through estimator).


def test_int8_fwd_trainable_matches_serving_kernel(branch_inputs):
    """The quant=True trainable wrapper's primal must equal the serving int8
    kernel bit-exactly (same kernel, weights quantized inside the wrapper),
    and the custom_vjp fwd (emit_train) output must equal the primal."""
    from gtax.kernels.quant import fused_spatial_branch_q
    from gtax.nn.branches import trainable_spatial_branch

    x, shift, scale, g, qkv_w, out_w, out_b = branch_inputs
    N, S, D = x.shape
    num_heads = 2
    freqs = jax.random.normal(jax.random.PRNGKey(9), (S, D // num_heads))
    qkv_q, qkv_s = quantize_weight(qkv_w)
    out_q, out_s = quantize_weight(out_w)
    serving = fused_spatial_branch_q(x, shift, scale, g, qkv_q, qkv_s,
                                     out_q, out_s, out_b, freqs, num_heads)
    f = trainable_spatial_branch(num_heads, "float32", quant=True)
    primal = f(x, shift, scale, g, qkv_w, out_w, out_b, freqs)
    np.testing.assert_array_equal(np.asarray(primal), np.asarray(serving))
    # under differentiation the emit_train path runs; outputs must agree
    out_vjp, _ = jax.vjp(f, x, shift, scale, g, qkv_w, out_w, out_b, freqs)
    np.testing.assert_array_equal(np.asarray(out_vjp), np.asarray(serving))


def test_int8_fwd_emit_residuals_match_nonemit():
    """emit_train=True must not change the branch outputs of any of the
    three int8 kernels (the residual writes are pure additions)."""
    from gtax.kernels.quant import (
        fused_mlp_branch_q,
        fused_spatial_branch_q,
        fused_temporal_branch_q,
    )

    key = jax.random.PRNGKey(5)
    N, S, D = 5, 48, 64
    H, num_heads = 4 * D, 2
    ks = jax.random.split(key, 12)
    x = jax.random.normal(ks[0], (N, S, D))
    shift = jax.random.normal(ks[1], (N, D)) * 0.1
    scale = jax.random.normal(ks[2], (N, D)) * 0.1
    g = jax.random.normal(ks[3], (N, D)) * 0.5
    qkv_q, qkv_s = quantize_weight(
        jax.random.normal(ks[4], (D, 3 * D)) * 0.05)
    out_q, out_s = quantize_weight(jax.random.normal(ks[5], (D, D)) * 0.05)
    out_b = jax.random.normal(ks[6], (D,)) * 0.01
    w1_q, w1_s = quantize_weight(jax.random.normal(ks[7], (D, H)) * 0.05)
    b1 = jax.random.normal(ks[8], (H,)) * 0.01
    w2_q, w2_s = quantize_weight(jax.random.normal(ks[9], (H, D)) * 0.05)
    b2 = jax.random.normal(ks[10], (D,)) * 0.01
    freqs_s = jax.random.normal(ks[11], (S, D // num_heads))
    freqs_t = jax.random.normal(ks[11], (N, D // num_heads))

    o0 = fused_spatial_branch_q(x, shift, scale, g, qkv_q, qkv_s, out_q,
                                out_s, out_b, freqs_s, num_heads)
    o1, q, k, v, y = fused_spatial_branch_q(
        x, shift, scale, g, qkv_q, qkv_s, out_q, out_s, out_b, freqs_s,
        num_heads, emit_train=True)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
    for r in (q, k, v, y):
        assert r.shape == x.shape and np.isfinite(np.asarray(r)).all()

    o0 = fused_temporal_branch_q(x, shift, scale, g, qkv_q, qkv_s, out_q,
                                 out_s, out_b, freqs_t, None, num_heads, N)
    o1, q, k, v, y = fused_temporal_branch_q(
        x, shift, scale, g, qkv_q, qkv_s, out_q, out_s, out_b, freqs_t,
        None, num_heads, N, emit_train=True)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))

    o0 = fused_mlp_branch_q(x, shift, scale, g, w1_q, w1_s, b1, w2_q, w2_s,
                            b2)
    o1, h1, y = fused_mlp_branch_q(x, shift, scale, g, w1_q, w1_s, b1,
                                   w2_q, w2_s, b2, emit_train=True)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
    assert h1.shape == (N, S, H) and np.isfinite(np.asarray(h1)).all()
    assert y.shape == x.shape


def test_int8_fwd_gradients_close_to_bf16_path():
    """Gradients through the quant=True wrappers must stay within
    quantization-level distance of the exact fused path's gradients for
    every differentiable argument, for all three branches."""
    from gtax.nn import branches as br

    N, S, D, H, heads = 5, 16, 64, 256, 4
    T = N
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    f32 = jnp.float32
    x = jax.random.normal(ks[0], (N, S, D), f32)
    sh = jax.random.normal(ks[1], (N, D), f32) * 0.1
    sc = jax.random.normal(ks[2], (N, D), f32) * 0.1
    g = jax.random.normal(ks[3], (N, D), f32) * 0.5
    qkv_w = jax.random.normal(ks[4], (D, 3 * D), f32) * 0.05
    out_w = jax.random.normal(ks[5], (D, D), f32) * 0.05
    out_b = jax.random.normal(ks[6], (D,), f32) * 0.01
    w1 = jax.random.normal(ks[7], (D, H), f32) * 0.05
    b1 = jax.random.normal(ks[8], (H,), f32) * 0.01
    w2 = jax.random.normal(ks[9], (H, D), f32) * 0.05
    b2 = jax.random.normal(ks[10], (D,), f32) * 0.01
    rope_s = jax.random.normal(ks[11], (S, D // heads), f32)
    rope_t = jax.random.normal(ks[11], (T, D // heads), f32)
    ct_like = jax.random.normal(ks[0], (N, S, D), f32)

    def check(name, fq, fb, args, skip=()):
        idx = tuple(i for i in range(len(args)) if i not in skip)
        gq = jax.grad(lambda *a: jnp.sum(fq(*a) * ct_like),
                      argnums=idx)(*args)
        gb = jax.grad(lambda *a: jnp.sum(fb(*a) * ct_like),
                      argnums=idx)(*args)
        for i, (a, b) in zip(idx, zip(gq, gb)):
            assert np.isfinite(np.asarray(a)).all(), f"{name} arg {i}"
            scale = max(1e-8, float(jnp.abs(b).max()))
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-2 * scale,
                err_msg=f"{name} arg {i}")

    check("mlp", br.trainable_mlp_branch("float32", quant=True),
          br.trainable_mlp_branch("float32"),
          (x, sh, sc, g, w1, b1, w2, b2))
    check("spatial",
          br.trainable_spatial_branch(heads, "float32", quant=True),
          br.trainable_spatial_branch(heads, "float32"),
          (x, sh, sc, g, qkv_w, out_w, out_b, rope_s), skip=(7,))
    check("temporal",
          br.trainable_temporal_branch(heads, T, False, "float32",
                                       quant=True),
          br.trainable_temporal_branch(heads, T, False, "float32"),
          (x, sh, sc, g, qkv_w, out_w, out_b, rope_t), skip=(7,))
