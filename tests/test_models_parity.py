"""Activation-level parity of the JAX DiT/VAE against recorded torch-reference
outputs (fixtures from scripts/gen_golden.py, float32 end to end)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from gtax.io import safetensors_port as port
from gtax.models.dit import DiTConfig, dit_apply
from gtax.models.vae import VAEConfig, vae_decode, vae_encode
from tests.conftest import GOLDEN, assert_close

DIT_SMALL = DiTConfig(
    input_h=18, input_w=32, patch_size=2, in_channels=16, hidden_size=128,
    depth=2, num_heads=4, mlp_ratio=4.0, external_cond_dim=25, max_frames=5,
)
VAE_SMALL = VAEConfig(
    latent_dim=8, input_height=120, input_width=160, patch_size=20,
    enc_dim=128, enc_depth=2, enc_heads=4, dec_dim=128, dec_depth=3,
    dec_heads=4, mlp_ratio=4.0,
)


def _dit_params():
    path = os.path.join(GOLDEN, "dit_small.safetensors")
    if not os.path.exists(path):
        pytest.skip("run scripts/gen_golden.py first")
    state = port.read_safetensors(path)
    params, missing, unexpected = port.dit_from_torch(state, DIT_SMALL)
    assert not missing, missing
    # shared rotary aliases may survive save_model dedup; nothing else should
    assert all("rotary_emb" in k for k in unexpected), unexpected
    return params


def _vae_params():
    path = os.path.join(GOLDEN, "vae_small.safetensors")
    if not os.path.exists(path):
        pytest.skip("run scripts/gen_golden.py first")
    state = port.read_safetensors(path)
    params, missing, unexpected = port.vae_from_torch(state, VAE_SMALL)
    assert not missing, missing
    assert not unexpected, unexpected
    return params


def test_timestep_embedding_parity(golden):
    from gtax.nn.layers import timestep_embedding

    g = golden("timestep_embedding.npz")
    emb = timestep_embedding(jnp.asarray(g["t"]), 256)
    # fp32 cos/exp of args up to 999 differ between XLA and torch by ~1e-3;
    # this is inherent transcendental noise, not a math mismatch.
    assert_close(emb, g["emb"], atol=5e-3)


def test_dit_forward_parity(golden):
    g = golden("dit_small.npz")
    params = _dit_params()
    x, t = jnp.asarray(g["x"]), jnp.asarray(g["t"])
    acts = jnp.asarray(g["actions"])
    v = dit_apply(params, DIT_SMALL, x, t, acts, compute_dtype=jnp.float32)
    assert_close(v, g["v_cond"], atol=2e-4, rtol=1e-4, name="conditioned")
    v_u = dit_apply(params, DIT_SMALL, x, t, None, compute_dtype=jnp.float32)
    assert_close(v_u, g["v_uncond"], atol=2e-4, rtol=1e-4, name="unconditioned")


def test_dit_growing_window_vs_padded(golden):
    """A T=3 reference forward must equal slots [2:] of a padded T=5 forward
    with the first two slots masked invalid — the property the rollout's fixed
    window relies on."""
    g = golden("dit_small.npz")
    params = _dit_params()
    x, t, acts = jnp.asarray(g["x"]), jnp.asarray(g["t"]), jnp.asarray(g["actions"])
    # direct T=3 forward
    v3 = dit_apply(
        params, DIT_SMALL, x[:, :3], t[:, :3], acts[:, :3],
        compute_dtype=jnp.float32,
    )
    assert_close(v3, g["v_t3"], atol=2e-4, rtol=1e-4, name="T=3 direct")
    # padded-window forward: garbage in slots 0-1, masked out temporally
    pad_x = jnp.concatenate([jnp.ones_like(x[:, :2]) * 123.0, x[:, :3]], axis=1)
    pad_t = jnp.concatenate([t[:, :2] * 0, t[:, :3]], axis=1)
    pad_a = jnp.concatenate([jnp.zeros_like(acts[:, :2]), acts[:, :3]], axis=1)
    valid = jnp.asarray([False, False, True, True, True])
    v5 = dit_apply(
        params, DIT_SMALL, pad_x, pad_t, pad_a, valid, compute_dtype=jnp.float32
    )
    assert_close(v5[:, 2:], g["v_t3"], atol=2e-4, rtol=1e-4, name="padded")


def test_vae_parity(golden):
    g = golden("vae_small.npz")
    params = _vae_params()
    mean, logvar = vae_encode(
        params, VAE_SMALL, jnp.asarray(g["img"]), compute_dtype=jnp.float32
    )
    assert_close(mean, g["mean"], atol=2e-4, rtol=1e-4, name="mean")
    assert_close(logvar, g["logvar"], atol=2e-4, rtol=1e-4, name="logvar")
    dec = vae_decode(params, VAE_SMALL, jnp.asarray(g["mean"]),
                     compute_dtype=jnp.float32)
    assert_close(dec, g["dec"], atol=2e-4, rtol=1e-4, name="decode")


def test_port_roundtrip():
    """gtax -> torch-layout -> gtax must be exact."""
    params = _dit_params()
    state = port.dit_to_torch(params, DIT_SMALL)
    params2, missing, _ = port.dit_from_torch(state, DIT_SMALL)
    assert not missing
    import jax

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    vparams = _vae_params()
    vstate = port.vae_to_torch(vparams, VAE_SMALL)
    vparams2, vmissing, vunexpected = port.vae_from_torch(vstate, VAE_SMALL)
    assert not vmissing and not vunexpected
    for a, b in zip(jax.tree.leaves(vparams), jax.tree.leaves(vparams2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_fullsize_key_manifest(golden):
    """Our port's expected key set must exactly cover the real DiT-S/2 and
    ViT-L/20 state_dicts (shapes included)."""
    import json

    path = os.path.join(GOLDEN, "state_dict_manifest.json")
    if not os.path.exists(path):
        pytest.skip("run scripts/gen_golden.py first")
    with open(path) as f:
        manifest = json.load(f)
    from gtax.models.dit import DiT_S_2
    from gtax.models.vae import ViT_L_20_Shallow_Encoder

    cfg = DiT_S_2()
    expected = port.expected_dit_keys(cfg)
    real = set(manifest["dit"])
    # the torch module also exposes per-block aliases of the shared rotary
    # freqs; everything else must match exactly
    assert expected - real == set(), expected - real
    leftover = real - expected
    assert all("rotary_emb.freqs" in k for k in leftover), leftover

    vcfg = ViT_L_20_Shallow_Encoder()
    vstate = {k: np.zeros(v, np.float32) for k, v in manifest["vae"].items()}
    vparams, vmissing, vunexpected = port.vae_from_torch(vstate, vcfg)
    assert not vmissing, vmissing
    assert not vunexpected, vunexpected

    # param-count sanity vs the reference modules
    import jax

    dstate = {k: np.zeros(v, np.float32) for k, v in manifest["dit"].items()}
    dparams, dmissing, _ = port.dit_from_torch(dstate, cfg)
    assert not dmissing
    n_dit = sum(x.size for x in jax.tree.leaves(dparams))
    n_vae = sum(x.size for x in jax.tree.leaves(vparams))
    assert n_dit == manifest["dit_params"], (n_dit, manifest["dit_params"])
    assert n_vae == manifest["vae_params"], (n_vae, manifest["vae_params"])
