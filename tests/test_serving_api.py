"""Library serving API (gtax.serving.VideoGenerator) tests.

The reference has no library surface (generate.py is script-only,
/root/reference/generate.py:71-246); gtax exposes the same rollout as a
load-once / generate-many object. These tests pin the API contract:
shape/rank promotion, determinism under a fixed seed, and num_frames
semantics (prompt + generated, reference --total-frames)."""

import dataclasses

import numpy as np
import pytest

from gtax.serving import ServingConfig, VideoGenerator

CFG = ServingConfig(
    dtype="float32", attention_backend="xla", unstack=False,
    noise_steps=3, dit_model="DiT-debug", vae_model="vae-debug",
)


@pytest.fixture(scope="module")
def gen():
    # empty paths -> random debug-size weights (checkpoint-free smoke path)
    return VideoGenerator.load("", "", CFG)


def _prompt(gen, b=None, t0=2):
    h, w = gen.vae_cfg.input_height, gen.vae_cfg.input_width
    rng = np.random.default_rng(0)
    shape = (t0, 3, h, w) if b is None else (b, t0, 3, h, w)
    return rng.random(shape, np.float32)


def test_rank4_prompt_promotes_to_batch1(gen):
    out = gen.generate(_prompt(gen), num_frames=5, seed=0)
    h, w = gen.vae_cfg.input_height, gen.vae_cfg.input_width
    assert out.shape == (1, 5, h, w, 3)
    assert out.dtype == np.uint8


def test_seed_determinism_and_batch_shape(gen):
    p = _prompt(gen, b=2)
    a = gen.generate(p, num_frames=4, seed=7)
    b = gen.generate(p, num_frames=4, seed=7)
    c = gen.generate(p, num_frames=4, seed=8)
    assert a.shape[:2] == (2, 4)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_actions_length_validated(gen):
    p = _prompt(gen)
    acts = np.zeros((1, 3, 25), np.float32)  # too short for 5 frames
    with pytest.raises(AssertionError, match="actions"):
        gen.generate(p, actions=acts, num_frames=5, seed=0)


def test_generators_do_not_share_backend_state(gen):
    """Two instances with different backends must not corrupt each other's
    traces or leak into the process-global backend: the backend is applied
    as a scope around each instance's compute calls."""
    from gtax.nn import attention as attention_mod

    before = attention_mod.get_backend()
    ref = gen.generate(_prompt(gen), num_frames=4, seed=3)
    gen2 = VideoGenerator.load(
        "", "", dataclasses.replace(CFG, attention_backend="pallas"))
    out2 = gen2.generate(_prompt(gen), num_frames=4, seed=3)
    # same weights/seed: the pallas path must agree with xla numerics
    np.testing.assert_allclose(out2.astype(np.int32), ref.astype(np.int32),
                               atol=1)
    # the first generator still runs its own (xla-traced) path afterwards
    np.testing.assert_array_equal(
        gen.generate(_prompt(gen), num_frames=4, seed=3), ref)
    assert attention_mod.get_backend() == before


def test_decode_chunking_bit_identical(gen):
    """decode_chunk bounds decoder memory for long rollouts; the VAE is
    per-frame so chunked output must equal the single batched decode."""
    p = _prompt(gen)
    ref = gen.generate(p, num_frames=7, seed=1)
    chunked = VideoGenerator(
        gen.dit_params, gen.vae_params,
        dataclasses.replace(CFG, decode_chunk=3))
    out = chunked.generate(p, num_frames=7, seed=1)
    np.testing.assert_array_equal(out, ref)


def test_last_timings_populated(gen):
    gen.generate(_prompt(gen), num_frames=4, seed=0)
    t = gen.last_timings
    assert set(t) == {"encode_s", "rollout_s", "decode_s", "fetch_s"}
    assert all(v > 0 for v in t.values())
