"""Paired serving kernels (gtax.kernels.pair): one dispatch per
attention+MLP half-block must equal the two sequential branch kernels.

The pair kernels cast the attention half's output to the compute dtype at
exactly the point the sequential kernels crossed HBM, and reuse the same
fp32/int8 helper math, so the comparison is equality (interpret mode is
deterministic), not a tolerance. Reference block semantics:
/root/reference/model/dit.py:200-225."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtax.kernels.pair import fused_spatial_pair_q, fused_temporal_pair_q
from gtax.kernels.quant import (
    fused_mlp_branch_q,
    fused_spatial_branch_q,
    fused_temporal_step_q,
    quantize_weight,
)


@pytest.fixture(scope="module")
def pair_inputs():
    key = jax.random.PRNGKey(7)
    N, S, D, H = 4, 48, 64, 256
    ks = jax.random.split(key, 14)
    x = jax.random.normal(ks[0], (N, S, D), jnp.bfloat16)
    vecs = [jax.random.normal(k, (N, D), jnp.bfloat16) * 0.3
            for k in ks[1:7]]
    qkv_q, qkv_s = quantize_weight(
        jax.random.normal(ks[7], (D, 3 * D)) * 0.05)
    out_q, out_s = quantize_weight(jax.random.normal(ks[8], (D, D)) * 0.05)
    out_b = jax.random.normal(ks[9], (D,), jnp.float32) * 0.01
    w1_q, w1_s = quantize_weight(jax.random.normal(ks[10], (D, H)) * 0.05)
    w2_q, w2_s = quantize_weight(jax.random.normal(ks[11], (H, D)) * 0.05)
    b1 = jax.random.normal(ks[12], (H,), jnp.float32) * 0.01
    b2 = jax.random.normal(ks[13], (D,), jnp.float32) * 0.01
    attn = (qkv_q, qkv_s, out_q, out_s, out_b)
    mlp = (w1_q, w1_s, b1, w2_q, w2_s, b2)
    return x, vecs, attn, mlp


def test_spatial_pair_equals_sequential(pair_inputs):
    x, (sh1, sc1, g1, sh2, sc2, g2), attn, mlp = pair_inputs
    N, S, D = x.shape
    num_heads = 2
    freqs = jax.random.normal(jax.random.PRNGKey(9), (S, D // num_heads))

    seq = fused_spatial_branch_q(x, sh1, sc1, g1, *attn, freqs, num_heads)
    seq = fused_mlp_branch_q(seq, sh2, sc2, g2, *mlp)
    got = fused_spatial_pair_q(x, sh1, sc1, g1, sh2, sc2, g2, *attn, *mlp,
                               freqs, num_heads)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(seq, np.float32))


@pytest.mark.parametrize("n_live", [1, 2])
def test_temporal_pair_equals_sequential(pair_inputs, n_live):
    x, (sh1, sc1, g1, sh2, sc2, g2), attn, mlp = pair_inputs
    N, S, D = x.shape
    num_heads = 2
    B = N // n_live
    n_ctx = 3
    T = n_ctx + n_live
    freqs = jax.random.normal(jax.random.PRNGKey(10), (T, D // num_heads))
    valid = jnp.array([False] + [True] * (T - 1))
    ks = jax.random.split(jax.random.PRNGKey(11), 2)
    k_ctx = jax.random.normal(ks[0], (B * n_ctx * S, D), jnp.bfloat16)
    v_ctx = jax.random.normal(ks[1], (B * n_ctx * S, D), jnp.bfloat16)

    # batch_tile=B pins the sequential step to its GRIDLESS form — the
    # layout the pair kernel fuses (round 4's default tiles the standalone
    # step at B>2; tiled vs gridless differ in last-bit dot accumulation
    # order and are compared under rtol in test_kernels instead)
    seq = fused_temporal_step_q(x, sh1, sc1, g1, *attn, k_ctx, v_ctx, freqs,
                                valid, num_heads, n_ctx, n_live=n_live,
                                batch_tile=x.shape[0] // n_live)
    seq = fused_mlp_branch_q(seq, sh2, sc2, g2, *mlp)
    got = fused_temporal_pair_q(x, sh1, sc1, g1, sh2, sc2, g2, *attn, *mlp,
                                k_ctx, v_ctx, freqs, valid, num_heads,
                                n_ctx, n_live=n_live)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(seq, np.float32))
