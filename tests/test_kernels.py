"""Pallas fused attention kernel vs the XLA reference path (interpret mode on
the CPU test mesh; the real-TPU comparison happens in benchmarks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtax.kernels import attention as kattn
from gtax.nn import attention as nnattn
from tests.conftest import assert_close


@pytest.fixture(autouse=True)
def interpret_mode():
    kattn.set_interpret(True)
    yield
    kattn.set_interpret(None)  # back to auto (CPU -> interpret)


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("S,d", [(5, 16), (12, 16), (48, 32)])
def test_fused_matches_xla_plain(S, d):
    q, k, v = rand(0, (6, S, d)), rand(1, (6, S, d)), rand(2, (6, S, d))
    out = kattn.fused_sdpa(q, k, v)
    ref = nnattn.sdpa(q, k, v)
    assert_close(out, ref, atol=2e-5, rtol=1e-4)


def test_fused_matches_xla_causal_valid():
    S, d = 5, 16
    q, k, v = rand(3, (4, 2, S, d)), rand(4, (4, 2, S, d)), rand(5, (4, 2, S, d))
    valid = jnp.asarray([False, False, True, True, True])
    mask = jnp.logical_or(valid[None, :], jnp.eye(S, dtype=bool))
    out = kattn.fused_sdpa(q, k, v, mask=mask, causal=True)
    ref = nnattn.sdpa(q, k, v, mask=mask, causal=True)
    assert_close(out, ref, atol=2e-5, rtol=1e-4)


def test_fused_1d_mask_matches_xla():
    """A 1-D mask is pure key validity — the fused bias must mirror the XLA
    path exactly (no open diagonal; callers wanting it pass valid|eye)."""
    S, d = 5, 16
    q, k, v = rand(6, (3, S, d)), rand(7, (3, S, d)), rand(8, (3, S, d))
    valid = jnp.asarray([False, True, True, True, True])
    out = kattn.fused_sdpa(q, k, v, mask=valid)
    ref = nnattn.sdpa(q, k, v, mask=valid[None, :])
    assert_close(out, ref, atol=2e-5, rtol=1e-4)
def test_batch_mask_falls_back():
    S, d = 5, 16
    q = rand(0, (2, S, d))
    mask = jnp.ones((2, S, S), bool)
    assert kattn.fused_sdpa(q, q, q, mask=mask) is None


def test_backend_switch_full_model(golden):
    """Whole small-DiT forward: pallas backend output == xla backend output."""
    import os

    from gtax.io import safetensors_port as port
    from gtax.models.dit import dit_apply
    from tests.conftest import GOLDEN
    from tests.test_models_parity import DIT_SMALL

    path = os.path.join(GOLDEN, "dit_small.safetensors")
    if not os.path.exists(path):
        pytest.skip("run scripts/gen_golden.py first")
    params, _, _ = port.dit_from_torch(port.read_safetensors(path), DIT_SMALL)
    g = golden("dit_small.npz")
    x, t = jnp.asarray(g["x"]), jnp.asarray(g["t"])
    acts = jnp.asarray(g["actions"])
    valid = jnp.asarray([True] * 5)

    nnattn.set_backend("xla")
    ref = dit_apply(params, DIT_SMALL, x, t, acts, valid,
                    compute_dtype=jnp.float32)
    nnattn.set_backend("pallas")
    try:
        out = dit_apply(params, DIT_SMALL, x, t, acts, valid,
                        compute_dtype=jnp.float32)
    finally:
        nnattn.set_backend("xla")
    assert_close(out, ref, atol=5e-5, rtol=1e-4)


def test_fused_spatial_branch_matches_xla(golden):
    """The fused LN->modulate->qkv->rope->attn->out->gate->residual kernel
    must reproduce the XLA spatial branch inside a full DiT forward."""
    import os

    from gtax.io import safetensors_port as port
    from gtax.models.dit import dit_apply
    from tests.conftest import GOLDEN
    from tests.test_models_parity import DIT_SMALL

    path = os.path.join(GOLDEN, "dit_small.safetensors")
    if not os.path.exists(path):
        pytest.skip("run scripts/gen_golden.py first")
    params, _, _ = port.dit_from_torch(port.read_safetensors(path), DIT_SMALL)
    g = golden("dit_small.npz")
    x, t = jnp.asarray(g["x"]), jnp.asarray(g["t"])
    acts = jnp.asarray(g["actions"])

    nnattn.set_backend("xla")
    ref = dit_apply(params, DIT_SMALL, x, t, acts, compute_dtype=jnp.float32)
    nnattn.set_backend("fused")
    try:
        out = dit_apply(params, DIT_SMALL, x, t, acts,
                        compute_dtype=jnp.float32)
    finally:
        nnattn.set_backend("xla")
    assert_close(out, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("backend", ["fused_mlp", "fused_all"])
def test_fused_mlp_backend_matches_xla(golden, backend):
    """Backend-equivalence for the remaining set_backend values: 'fused_mlp'
    (Pallas MLP branches only) and 'fused_all' (attention + MLP fused)."""
    import os

    from gtax.io import safetensors_port as port
    from gtax.models.dit import dit_apply
    from tests.conftest import GOLDEN
    from tests.test_models_parity import DIT_SMALL

    path = os.path.join(GOLDEN, "dit_small.safetensors")
    if not os.path.exists(path):
        pytest.skip("run scripts/gen_golden.py first")
    params, _, _ = port.dit_from_torch(port.read_safetensors(path), DIT_SMALL)
    g = golden("dit_small.npz")
    x, t = jnp.asarray(g["x"]), jnp.asarray(g["t"])
    acts = jnp.asarray(g["actions"])

    nnattn.set_backend("xla")
    ref = dit_apply(params, DIT_SMALL, x, t, acts, compute_dtype=jnp.float32)
    nnattn.set_backend(backend)
    try:
        out = dit_apply(params, DIT_SMALL, x, t, acts,
                        compute_dtype=jnp.float32)
    finally:
        nnattn.set_backend("xla")
    assert_close(out, ref, atol=5e-4, rtol=1e-3)


def test_unstacked_inference_matches_scan():
    """unstack_for_inference (per-block pytrees + Python loop — the serving
    layout, ~25% faster on v5e) must be numerically identical to the stacked
    scan, per backend."""
    from gtax.models.dit import (DiTConfig, dit_apply, dit_init,
                                 unstack_for_inference)

    cfg = DiTConfig(input_h=6, input_w=8, patch_size=2, in_channels=8,
                    hidden_size=128, depth=3, num_heads=2, max_frames=5,
                    external_cond_dim=25)
    params = dit_init(jax.random.PRNGKey(0), cfg)
    uparams = unstack_for_inference(params, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8, 6, 8))
    t = jnp.full((2, 5), 15, jnp.int32)
    acts = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 25))
    valid = jnp.asarray([False, True, True, True, True])
    for backend in ("xla", "fused_all"):
        nnattn.set_backend(backend)
        try:
            ref = dit_apply(params, cfg, x, t, acts, valid,
                            compute_dtype=jnp.float32)
            out = dit_apply(uparams, cfg, x, t, acts, valid,
                            compute_dtype=jnp.float32)
        finally:
            nnattn.set_backend("xla")
        assert_close(out, ref, atol=1e-5, rtol=1e-5, name=backend)


@pytest.mark.slow
def test_fused_backend_gradients_match_xla(golden):
    """The fused backend is TRAINABLE: custom_vjp pairs the Pallas forward
    with an XLA-autodiff backward (gtax.nn.branches). Parameter gradients
    must match the pure-XLA path."""
    import os

    from gtax.io import safetensors_port as port
    from gtax.models.dit import dit_apply
    from tests.conftest import GOLDEN
    from tests.test_models_parity import DIT_SMALL

    path = os.path.join(GOLDEN, "dit_small.safetensors")
    if not os.path.exists(path):
        pytest.skip("run scripts/gen_golden.py first")
    params, _, _ = port.dit_from_torch(port.read_safetensors(path), DIT_SMALL)
    g = golden("dit_small.npz")
    x, t = jnp.asarray(g["x"]), jnp.asarray(g["t"])
    acts = jnp.asarray(g["actions"])
    valid = jnp.asarray([False, True, True, True, True])
    target = jnp.asarray(g["v_cond"])

    def loss(p):
        v = dit_apply(p, DIT_SMALL, x, t, acts, valid,
                      compute_dtype=jnp.float32)
        return jnp.mean(jnp.square(v - target))

    nnattn.set_backend("xla")
    ref_grads = jax.grad(loss)(params)
    nnattn.set_backend("fused_all")
    try:
        out_grads = jax.grad(loss)(params)
    finally:
        nnattn.set_backend("xla")
    flat_r, tree_r = jax.tree_util.tree_flatten(ref_grads)
    flat_o, tree_o = jax.tree_util.tree_flatten(out_grads)
    assert tree_r == tree_o
    for r, o in zip(flat_r, flat_o):
        scale = max(1e-8, float(jnp.max(jnp.abs(r))))
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=5e-4 * scale + 1e-7, rtol=5e-3)
    # rope freq tables must receive ZERO gradient (reference keeps them
    # frozen: learned_freq=False, rotary_embedding_torch.py:138-144)
    assert float(jnp.abs(ref_grads["spatial_rope_freqs"]).max()) == 0.0
    assert float(jnp.abs(ref_grads["temporal_rope_freqs"]).max()) == 0.0


@pytest.mark.slow
def test_fused_backend_with_valid_mask(golden):
    """Fused temporal kernel must honour the padded-window validity mask
    (the rollout path)."""
    import os

    from gtax.io import safetensors_port as port
    from gtax.models.dit import dit_apply
    from tests.conftest import GOLDEN
    from tests.test_models_parity import DIT_SMALL

    path = os.path.join(GOLDEN, "dit_small.safetensors")
    if not os.path.exists(path):
        pytest.skip("run scripts/gen_golden.py first")
    params, _, _ = port.dit_from_torch(port.read_safetensors(path), DIT_SMALL)
    g = golden("dit_small.npz")
    x, t = jnp.asarray(g["x"]), jnp.asarray(g["t"])
    acts = jnp.asarray(g["actions"])
    valid = jnp.asarray([False, False, True, True, True])

    nnattn.set_backend("xla")
    ref = dit_apply(params, DIT_SMALL, x, t, acts, valid,
                    compute_dtype=jnp.float32)
    nnattn.set_backend("fused")
    try:
        out = dit_apply(params, DIT_SMALL, x, t, acts, valid,
                        compute_dtype=jnp.float32)
    finally:
        nnattn.set_backend("xla")
    assert_close(out, ref, atol=5e-4, rtol=1e-3)
    # and a batched (B=2) no-mask case exercises the kernel's batch loop
    nnattn.set_backend("fused")
    try:
        out2 = dit_apply(params, DIT_SMALL, x, t, acts,
                         compute_dtype=jnp.float32)
    finally:
        nnattn.set_backend("xla")
    ref2 = dit_apply(params, DIT_SMALL, x, t, acts, compute_dtype=jnp.float32)
    assert_close(out2, ref2, atol=5e-4, rtol=1e-3)


def test_fused_branches_multi_tile_grid():
    """Training-shape grids: enough frames that _frames_per_tile picks
    fpt > 1 AND n_tiles > 1, exercising the per-frame (F, D) BlockSpec
    tiling of adaLN vectors / rope tables (round-2 per-frame kernel
    inputs) against the pure-XLA branch math."""
    from gtax.kernels.block import (_frames_per_tile, fused_mlp_branch,
                                    fused_spatial_branch,
                                    fused_temporal_branch)
    from gtax.nn.branches import (xla_mlp_branch, xla_spatial_branch,
                                  xla_temporal_branch)

    N, S, D, H = 8, 128, 256, 4
    d = D // H
    assert _frames_per_tile(N, S) == 4  # 2 tiles x 4 frames (spatial/mlp)
    ks = jax.random.split(jax.random.PRNGKey(7), 12)
    x = jax.random.normal(ks[0], (N, S, D), jnp.float32)
    sh = jax.random.normal(ks[1], (N, D), jnp.float32) * 0.1
    sc = jax.random.normal(ks[2], (N, D), jnp.float32) * 0.1
    g = jax.random.normal(ks[3], (N, D), jnp.float32) * 0.1
    qkv_w = jax.random.normal(ks[4], (D, 3 * D), jnp.float32) * 0.05
    out_w = jax.random.normal(ks[5], (D, D), jnp.float32) * 0.05
    out_b = jax.random.normal(ks[6], (D,), jnp.float32) * 0.05
    sfreqs = jax.random.normal(ks[7], (S, d), jnp.float32)

    out = fused_spatial_branch(x, sh, sc, g, qkv_w, out_w, out_b, sfreqs, H)
    ref = xla_spatial_branch(x, sh, sc, g, qkv_w, out_w, out_b, sfreqs, H,
                             jnp.float32)
    assert_close(out, ref, atol=2e-4, rtol=1e-4)

    # temporal: B=8 batch elements, T=4 frames -> 8 single-batch tiles
    T = 4
    B = N // T * 4  # 8
    xt = jax.random.normal(ks[8], (B * T, S, D), jnp.float32)
    sht = jnp.tile(sh, (B * T // N, 1))
    tfreqs = jax.random.normal(ks[9], (T, d), jnp.float32)
    valid = jnp.asarray([False, True, True, True])
    outt = fused_temporal_branch(xt, sht, sc.repeat(B * T // N, 0),
                                 g.repeat(B * T // N, 0), qkv_w, out_w,
                                 out_b, tfreqs, valid, H, T)
    reft = xla_temporal_branch(xt, sht, sc.repeat(B * T // N, 0),
                               g.repeat(B * T // N, 0), qkv_w, out_w, out_b,
                               tfreqs, valid, H, T, jnp.float32)
    assert_close(outt, reft, atol=2e-4, rtol=1e-4)

    # temporal again at a shape where MULTIPLE batch elements share a tile
    # (b_pt=2, 4 tiles): S=64 -> T*S=256 rows, _frames_per_tile(8, 256)=2
    S2 = 64
    xt2 = jax.random.normal(ks[8], (B * T, S2, D), jnp.float32)
    tf2 = jax.random.normal(ks[9], (T, d), jnp.float32)
    outt2 = fused_temporal_branch(xt2, sht, sc.repeat(B * T // N, 0),
                                  g.repeat(B * T // N, 0), qkv_w, out_w,
                                  out_b, tf2, valid, H, T)
    reft2 = xla_temporal_branch(xt2, sht, sc.repeat(B * T // N, 0),
                                g.repeat(B * T // N, 0), qkv_w, out_w,
                                out_b, tf2, valid, H, T, jnp.float32)
    assert_close(outt2, reft2, atol=2e-4, rtol=1e-4)

    w1 = jax.random.normal(ks[10], (D, 4 * D), jnp.float32) * 0.05
    w2 = jax.random.normal(ks[11], (4 * D, D), jnp.float32) * 0.05
    b1 = jnp.zeros((4 * D,))
    b2 = jnp.zeros((D,))
    outm = fused_mlp_branch(x, sh, sc, g, w1, b1, w2, b2)
    refm = xla_mlp_branch(x, sh, sc, g, w1, b1, w2, b2, jnp.float32)
    assert_close(outm, refm, atol=2e-4, rtol=1e-4)


def test_quant_branches_tiling_consistent():
    """The int8 wrappers must give BIT-IDENTICAL results whether a frame
    batch runs as one tile or across a multi-tile grid (per-row dynamic
    quantization and per-frame attention are tile-local)."""
    from gtax.kernels.quant import (fused_spatial_branch_q, quantize_weight)

    N, S, D, H = 8, 128, 256, 4
    d = D // H
    ks = jax.random.split(jax.random.PRNGKey(11), 8)
    x = jax.random.normal(ks[0], (N, S, D), jnp.bfloat16)
    sh = (jax.random.normal(ks[1], (N, D)) * 0.1).astype(jnp.bfloat16)
    sc = (jax.random.normal(ks[2], (N, D)) * 0.1).astype(jnp.bfloat16)
    g = (jax.random.normal(ks[3], (N, D)) * 0.1).astype(jnp.bfloat16)
    qkv_q, qkv_s = quantize_weight(jax.random.normal(ks[4], (D, 3 * D)) * .05)
    out_q, out_s = quantize_weight(jax.random.normal(ks[5], (D, D)) * .05)
    out_b = jnp.zeros((D,), jnp.float32)
    sfreqs = jax.random.normal(ks[6], (S, d), jnp.float32)

    whole = fused_spatial_branch_q(x, sh, sc, g, qkv_q, qkv_s, out_q, out_s,
                                   out_b, sfreqs, H)  # 2 tiles x 4 frames
    half0 = fused_spatial_branch_q(x[:4], sh[:4], sc[:4], g[:4], qkv_q,
                                   qkv_s, out_q, out_s, out_b, sfreqs, H)
    half1 = fused_spatial_branch_q(x[4:], sh[4:], sc[4:], g[4:], qkv_q,
                                   qkv_s, out_q, out_s, out_b, sfreqs, H)
    np.testing.assert_array_equal(np.asarray(whole),
                                  np.asarray(jnp.concatenate([half0, half1])))


def test_residual_backward_grad_parity_per_branch():
    """The trainable wrappers' hand-written backwards (residuals emitted by
    the kernel forward, transpose GEMMs in XLA — gtax.nn.branches) must match
    XLA autodiff of the reference branch implementations, per argument, for
    all three branches. Rope FREQUENCY tables are excluded: their cotangent
    is zero by construction (frozen upstream via stop_gradient)."""
    from gtax.nn import branches as br

    N, S, D, H, heads = 10, 16, 64, 256, 4
    T = 5
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

    def check(name, fused_fn, xla_fn, args, skip=()):
        idx = tuple(i for i in range(len(args)) if i not in skip)
        gf = jax.grad(lambda *a: jnp.sum(fused_fn(*a) * ct_like),
                      argnums=idx)(*args)
        gx = jax.grad(lambda *a: jnp.sum(xla_fn(*a) * ct_like),
                      argnums=idx)(*args)
        for i, (a, b) in zip(idx, zip(gf, gx)):
            scale = max(1e-8, float(jnp.abs(b).max()))
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b),
                atol=5e-5 * scale, rtol=5e-4,
                err_msg=f"{name} arg {i}")

    check("mlp", br.trainable_mlp_branch("float32"),
          lambda *a: br.xla_mlp_branch(*a, f32),
          (x, sh, sc, g, w1, b1, w2, b2))
    check("spatial", br.trainable_spatial_branch(heads, "float32"),
          lambda *a: br.xla_spatial_branch(*a, heads, f32),
          (x, sh, sc, g, qkv_w, out_w, out_b, rope_s), skip=(7,))
    check("temporal", br.trainable_temporal_branch(heads, T, False, "float32"),
          lambda *a: br.xla_temporal_branch(*a[:8], None, heads, T, f32),
          (x, sh, sc, g, qkv_w, out_w, out_b, rope_t), skip=(7,))
    valid = jnp.asarray([False, True, True, True, True])
    check("temporal+valid",
          lambda *a: br.trainable_temporal_branch(
              heads, T, True, "float32")(*a, valid),
          lambda *a: br.xla_temporal_branch(*a[:8], valid, heads, T, f32),
          (x, sh, sc, g, qkv_w, out_w, out_b, rope_t), skip=(7,))


@pytest.mark.parametrize("shape", [(10, 16, 64, 256), (40, 16, 64, 128)])
def test_pallas_mlp_bwd_matches_xla_vjp(shape):
    """The fused Pallas MLP-branch backward (gtax.kernels.backward) must
    reproduce XLA autodiff through xla_mlp_branch — including the padded
    frame-tile case (N=40: 2 tiles of 20 frames padded to 24) and the
    weight-grad accumulation across tiles."""
    from gtax.kernels.backward import fused_mlp_branch_bwd
    from gtax.nn.branches import xla_mlp_branch

    N, S, D, H = shape
    r = np.random.default_rng(1)
    x = jnp.asarray(r.normal(size=(N, S, D)), jnp.float32)
    shift = jnp.asarray(r.normal(size=(N, D)), jnp.float32)
    scale = jnp.asarray(r.normal(size=(N, D)) * 0.1, jnp.float32)
    g = jnp.asarray(r.normal(size=(N, D)) * 0.5, jnp.float32)
    w1 = jnp.asarray(r.normal(size=(D, H)) * 0.05, jnp.float32)
    b1 = jnp.asarray(r.normal(size=(H,)) * 0.01, jnp.float32)
    w2 = jnp.asarray(r.normal(size=(H, D)) * 0.05, jnp.float32)
    b2 = jnp.asarray(r.normal(size=(D,)) * 0.01, jnp.float32)
    ct = jnp.asarray(r.normal(size=(N, S, D)), jnp.float32)

    out, vjp = jax.vjp(
        lambda *a: xla_mlp_branch(*a, dtype=jnp.float32),
        x, shift, scale, g, w1, b1, w2, b2)
    ref = vjp(ct)

    # residuals the kernel consumes (same math the fwd kernel emits)
    from gtax.nn.layers import gelu_tanh, layer_norm, modulate
    mod = modulate(layer_norm(x), shift, scale)
    h1 = jnp.einsum("nsd,dh->nsh", mod, w1) + b1
    y = jnp.einsum("nsh,hd->nsd", gelu_tanh(h1), w2) + b2

    got = fused_mlp_branch_bwd(x, shift, scale, g, w1, w2, h1, y, ct)
    names = ["dx", "dshift", "dscale", "dg", "dW1", "db1", "dW2", "db2"]
    for name, a, b in zip(names, got, ref):
        scale_ = max(1e-8, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-5 * scale_, rtol=5e-4, err_msg=name)


def test_pallas_attention_bwd_matches_xla_vjp():
    """The fused Pallas spatial/temporal attention-branch backwards
    (gtax.kernels.backward) must reproduce XLA autodiff through the
    xla_* reference branches (multi-tile, valid-masked)."""
    from gtax.kernels.backward import (fused_spatial_branch_bwd,
                                       fused_temporal_branch_bwd)
    from gtax.nn.branches import xla_spatial_branch, xla_temporal_branch
    from gtax.kernels.block import fused_spatial_branch, fused_temporal_branch

    r = np.random.default_rng(2)
    B, T, S, D, nh = 2, 5, 16, 64, 4
    N, d = B * T, D // nh
    x = jnp.asarray(r.normal(size=(N, S, D)), jnp.float32)
    shift = jnp.asarray(r.normal(size=(N, D)), jnp.float32)
    scale = jnp.asarray(r.normal(size=(N, D)) * 0.1, jnp.float32)
    g = jnp.asarray(r.normal(size=(N, D)) * 0.5, jnp.float32)
    qkv_w = jnp.asarray(r.normal(size=(D, 3 * D)) * 0.05, jnp.float32)
    out_w = jnp.asarray(r.normal(size=(D, D)) * 0.05, jnp.float32)
    out_b = jnp.asarray(r.normal(size=(D,)) * 0.01, jnp.float32)
    sfreqs = jnp.asarray(r.normal(size=(S, d)) * 0.3, jnp.float32)
    tfreqs = jnp.asarray(r.normal(size=(T, d)) * 0.3, jnp.float32)
    valid = jnp.asarray([False, True, True, True, True])
    ct = jnp.asarray(r.normal(size=(N, S, D)), jnp.float32)

    # spatial ------------------------------------------------------------
    _, vjp = jax.vjp(
        lambda *a: xla_spatial_branch(*a, num_heads=nh, dtype=jnp.float32),
        x, shift, scale, g, qkv_w, out_w, out_b, sfreqs)
    ref = vjp(ct)
    _, qr, kr, vr, y = fused_spatial_branch(
        x, shift, scale, g, qkv_w, out_w, out_b, sfreqs, nh, emit_train=True)
    got = fused_spatial_branch_bwd(x, shift, scale, g, qkv_w, out_w, sfreqs,
                                   qr, kr, vr, y, ct, num_heads=nh)
    names = ["dx", "dshift", "dscale", "dg", "dW_qkv", "dW_out", "db_out"]
    for name, a, b in zip(names, got, ref[:7]):
        s = max(1e-8, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=1e-4 * s, rtol=5e-4, err_msg="spatial " + name)

    # temporal (with validity mask) --------------------------------------
    _, vjp = jax.vjp(
        lambda *a: xla_temporal_branch(*a, valid, num_heads=nh, n_frames=T,
                                       dtype=jnp.float32),
        x, shift, scale, g, qkv_w, out_w, out_b, tfreqs)
    ref = vjp(ct)
    _, qr, kr, vr, y = fused_temporal_branch(
        x, shift, scale, g, qkv_w, out_w, out_b, tfreqs, valid, nh, T,
        emit_train=True)
    got = fused_temporal_branch_bwd(x, shift, scale, g, qkv_w, out_w, tfreqs,
                                    valid, qr, kr, vr, y, ct, num_heads=nh,
                                    n_frames=T)
    for name, a, b in zip(names, got, ref[:7]):
        s = max(1e-8, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=1e-4 * s, rtol=5e-4, err_msg="temporal " + name)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("n_live,B", [(1, 2), (2, 1), (4, 2)])
def test_temporal_step_n_live_matches_full(n_live, B, quant):
    """fused_temporal_step with n_live live frames against cached context
    K/V reproduces the full fused_temporal_branch output for those window
    slots — the kernel contract behind incremental pipelined decoding
    (reference workload: generate.py:200-235 at pipeline depth n_live)."""
    from gtax.kernels.block import fused_temporal_branch, fused_temporal_step

    T, S, D, heads = 5, 8, 32, 2
    n_ctx = T - n_live
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (B * T, S, D), jnp.float32)
    shift = jax.random.normal(ks[1], (B * T, D), jnp.float32) * 0.1
    scale = jax.random.normal(ks[2], (B * T, D), jnp.float32) * 0.1
    gate = jax.random.normal(ks[3], (B * T, D), jnp.float32)
    qkv_w = jax.random.normal(ks[4], (D, 3 * D), jnp.float32) * 0.05
    out_w = jax.random.normal(ks[5], (D, D), jnp.float32) * 0.05
    out_b = jnp.zeros((D,), jnp.float32)
    freqs = jnp.arange(T, dtype=jnp.float32)[:, None] * jnp.linspace(
        0.1, 1.0, D // heads)[None, :]
    valid = jnp.asarray([False, True, True, True, True])

    if quant:
        from gtax.kernels.quant import (fused_temporal_branch_q,
                                        fused_temporal_step_q, quantize_weight)

        qkv_q, qkv_s = quantize_weight(qkv_w)
        out_q, out_s = quantize_weight(out_w)
        full, kk, vv = fused_temporal_branch_q(
            x, shift, scale, gate, qkv_q, qkv_s, out_q, out_s, out_b, freqs,
            valid, heads, T, emit_kv=True)
    else:
        full, kk, vv = fused_temporal_branch(
            x, shift, scale, gate, qkv_w, out_w, out_b, freqs, valid, heads,
            T, emit_kv=True)

    def live_rows(a):
        return a.reshape((B, T) + a.shape[1:])[:, n_ctx:].reshape(
            (B * n_live,) + a.shape[1:])

    k_ctx = kk.reshape(B, T, S, D)[:, :n_ctx].reshape(B * n_ctx * S, D)
    v_ctx = vv.reshape(B, T, S, D)[:, :n_ctx].reshape(B * n_ctx * S, D)
    if quant:
        step = fused_temporal_step_q(
            live_rows(x), live_rows(shift), live_rows(scale),
            live_rows(gate), qkv_q, qkv_s, out_q, out_s, out_b, k_ctx, v_ctx,
            freqs, valid, heads, n_ctx, n_live=n_live)
    else:
        step = fused_temporal_step(
            live_rows(x), live_rows(shift), live_rows(scale),
            live_rows(gate), qkv_w, out_w, out_b, k_ctx, v_ctx, freqs, valid,
            heads, n_ctx, n_live=n_live)
    want = full.reshape(B, T, S, D)[:, n_ctx:].reshape(B * n_live, S, D)
    assert_close(step, want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("quant", [False, True])
def test_temporal_step_batch_tiled_matches_gridless(quant):
    """The batch-tiled temporal-step form (B=16+ serving; it lifts the
    gridless form's VMEM ceiling) must equal the gridless single-call form.
    batch_tile is the explicit static override so the tiled trace actually
    compiles at CPU test sizes."""
    import gtax.kernels.block as blk

    T, S, D, heads, B, n_live = 5, 8, 32, 2, 4, 1
    n_ctx = T - n_live
    ks = jax.random.split(jax.random.PRNGKey(13), 8)
    x = jax.random.normal(ks[0], (B * n_live, S, D), jnp.float32)
    shift = jax.random.normal(ks[1], (B * n_live, D), jnp.float32) * 0.1
    scale = jax.random.normal(ks[2], (B * n_live, D), jnp.float32) * 0.1
    gate = jax.random.normal(ks[3], (B * n_live, D), jnp.float32)
    qkv_w = jax.random.normal(ks[4], (D, 3 * D), jnp.float32) * 0.05
    out_w = jax.random.normal(ks[5], (D, D), jnp.float32) * 0.05
    out_b = jnp.zeros((D,), jnp.float32)
    k_ctx = jax.random.normal(ks[6], (B * n_ctx * S, D), jnp.float32)
    v_ctx = jax.random.normal(ks[7], (B * n_ctx * S, D), jnp.float32)
    freqs = jnp.arange(T, dtype=jnp.float32)[:, None] * jnp.linspace(
        0.1, 1.0, D // heads)[None, :]
    valid = jnp.asarray([False, True, True, True, True])

    if quant:
        from gtax.kernels.quant import fused_temporal_step_q, quantize_weight

        qkv_q, qkv_s = quantize_weight(qkv_w)
        out_q, out_s = quantize_weight(out_w)

        def run(bt):
            return fused_temporal_step_q(
                x, shift, scale, gate, qkv_q, qkv_s, out_q, out_s, out_b,
                k_ctx, v_ctx, freqs, valid, heads, n_ctx, n_live=n_live,
                batch_tile=bt)
    else:
        def run(bt):
            return blk.fused_temporal_step(
                x, shift, scale, gate, qkv_w, out_w, out_b, k_ctx, v_ctx,
                freqs, valid, heads, n_ctx, n_live=n_live, batch_tile=bt)

    ref = run(None)          # gridless (B rows fit at test size)
    for bt in (2, 1):        # 2 tiles of 2 / 4 tiles of 1
        got = np.asarray(run(bt))
        if quant:
            # fp32 contraction order inside the stacked dots varies with
            # the GEMM shape, occasionally flipping a dynamic-int8 round by
            # one step (same effect as the chunked-MLP note in
            # tests/test_quant.py) — tolerance, not equality
            np.testing.assert_allclose(got, np.asarray(ref), atol=2e-3,
                                       rtol=2e-3, err_msg=f"batch_tile={bt}")
        else:
            np.testing.assert_array_equal(got, np.asarray(ref),
                                          err_msg=f"batch_tile={bt}")
