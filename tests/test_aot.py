"""AOT-serialized serving executables (gtax.aot): cold start without the
serving-layout compile.

The reference loads weights and runs eagerly (generate.py:122-146 — no
compile to skip); on TPU the unstacked serving layout's first compile is
~4 minutes, so shipping the compiled executable IS the load-and-go parity
story. These tests pin the cache contract on the CPU backend: first use
compiles + saves, a fresh process-equivalent (new VideoGenerator) loads
without compiling, results are bit-identical, and a corrupt artifact falls
back to a fresh compile instead of failing."""

import dataclasses

import numpy as np
import pytest

from gtax.serving import ServingConfig, VideoGenerator

CFG = ServingConfig(
    dtype="float32", attention_backend="xla", unstack=False,
    noise_steps=3, dit_model="DiT-debug", vae_model="vae-debug",
)


def _prompt(gen, t0=2):
    h, w = gen.vae_cfg.input_height, gen.vae_cfg.input_width
    return np.random.default_rng(0).random((1, t0, 3, h, w), np.float32)


def _events(gen, kind, tag_substr=""):
    return [e for e in gen._aot.events
            if e[0] == kind and tag_substr in e[1]]


def test_aot_compile_save_then_load_bit_identical(tmp_path):
    cfg = dataclasses.replace(CFG, aot_dir=str(tmp_path))
    g1 = VideoGenerator.load("", "", cfg)
    out1 = g1.generate(_prompt(g1), num_frames=4, seed=3)
    # first use: encode/rollout/decode each compiled and saved
    assert len(_events(g1, "compile")) == 3
    assert len(_events(g1, "save")) == 3
    assert len(list(tmp_path.glob("*.aotx"))) == 3

    # a fresh generator (new process equivalent) must LOAD, not compile —
    # except for the rare XLA AOT-loader call-time fault, where the runner
    # falls back to ONE fresh compile (call_failed event) and the output
    # must still be identical
    g2 = VideoGenerator.load("", "", cfg)
    out2 = g2.generate(_prompt(g2), num_frames=4, seed=3)
    assert len(_events(g2, "load")) == 3
    n_fallbacks = len(_events(g2, "call_failed"))
    assert len(_events(g2, "compile")) == n_fallbacks
    np.testing.assert_array_equal(out1, out2)

    # new shapes are new cache entries, not collisions (rollout: new
    # num_gen_frames; decode: new latent length; encode: same prompt shape)
    g2.generate(_prompt(g2), num_frames=5, seed=3)
    assert len(_events(g2, "compile")) == 2 + n_fallbacks
    assert len(list(tmp_path.glob("*.aotx"))) == 5


def test_aot_corrupt_artifact_falls_back_to_compile(tmp_path):
    cfg = dataclasses.replace(CFG, aot_dir=str(tmp_path))
    g1 = VideoGenerator.load("", "", cfg)
    out1 = g1.generate(_prompt(g1), num_frames=4, seed=5)
    for p in tmp_path.glob("*.aotx"):
        p.write_bytes(b"not a pickle")
    g2 = VideoGenerator.load("", "", cfg)
    out2 = g2.generate(_prompt(g2), num_frames=4, seed=5)
    assert len(_events(g2, "load_failed")) == 3
    assert len(_events(g2, "compile")) == 3
    np.testing.assert_array_equal(out1, out2)


def test_aot_off_by_default():
    g = VideoGenerator.load("", "", CFG)
    assert g._aot is None


def test_aot_covers_shardmap_dp(tmp_path):
    """mesh_data batched serving must ride the AOT cache too (round-5: a
    shard_map executable serializes/loads like any other): first process
    compiles + saves the DP rollout executable, a fresh process-equivalent
    loads it, outputs bit-identical."""
    cfg = dataclasses.replace(CFG, aot_dir=str(tmp_path), mesh_data=2)
    g1 = VideoGenerator.load("", "", cfg)
    prompt = np.concatenate([_prompt(g1)] * 2)  # B=2 over 2 devices
    out1 = g1.generate(prompt, num_frames=4, seed=3)
    assert any("rollout_dp2" in e[1] for e in _events(g1, "compile"))
    assert len(_events(g1, "save")) == 3

    g2 = VideoGenerator.load("", "", cfg)
    out2 = g2.generate(prompt, num_frames=4, seed=3)
    n_fallbacks = len(_events(g2, "call_failed"))
    assert len(_events(g2, "load")) == 3
    assert len(_events(g2, "compile")) == n_fallbacks
    np.testing.assert_array_equal(out1, out2)


def test_aot_prewarm_builds_and_validates_runners(tmp_path):
    """prewarm() must build + execute the encode/rollout/decode runners for
    a generate() shape in the background so a following generate() with the
    same shape finds warm, validated runners (no further compiles/loads),
    and its output must be identical to a cold generator's."""
    cfg = dataclasses.replace(CFG, aot_dir=str(tmp_path))
    g1 = VideoGenerator.load("", "", cfg)
    t = g1.prewarm(num_frames=4, batch_size=1, n_prompt=2, wait=True)
    assert t is not None and not t.is_alive()
    kinds = [e[0] for e in g1._aot.events]
    assert "prewarm_done" in kinds and "prewarm_failed" not in kinds
    assert len(_events(g1, "compile")) == 3  # encode, rollout, decode
    n_runners = len(g1._aot_runners)
    out1 = g1.generate(_prompt(g1), num_frames=4, seed=3)
    # same shapes -> the warm runners are reused, nothing new is built
    assert len(g1._aot_runners) == n_runners
    assert len(_events(g1, "compile")) == 3

    g2 = VideoGenerator.load("", "", cfg)  # cold, loads g1's artifacts
    out2 = g2.generate(_prompt(g2), num_frames=4, seed=3)
    np.testing.assert_array_equal(out1, out2)

    # prewarm with AOT off is a documented no-op
    assert VideoGenerator.load("", "", CFG).prewarm(num_frames=4) is None


def test_aot_config_semantics_keyed(tmp_path):
    """Two configs with IDENTICAL arg shapes must not collide on one
    executable: noise_steps (and every other semantics-affecting
    ServingConfig field) is closure-captured in the jitted rollout, so it
    must be part of the artifact key (round-4 advisor finding). A 5-step
    rollout run against a cache populated by a 3-step config must compile
    its own artifacts, and its output must equal the cache-free output."""
    cfg3 = dataclasses.replace(CFG, aot_dir=str(tmp_path))
    cfg5 = dataclasses.replace(CFG, aot_dir=str(tmp_path), noise_steps=5)
    assert (VideoGenerator.load("", "", cfg3)._aot_tag
            != VideoGenerator.load("", "", cfg5)._aot_tag)

    g3 = VideoGenerator.load("", "", cfg3)
    g3.generate(_prompt(g3), num_frames=4, seed=7)
    n_after_3 = len(list(tmp_path.glob("*.aotx")))

    ref = VideoGenerator.load(
        "", "", dataclasses.replace(CFG, noise_steps=5))
    want = ref.generate(_prompt(ref), num_frames=4, seed=7)

    g5 = VideoGenerator.load("", "", cfg5)
    out = g5.generate(_prompt(g5), num_frames=4, seed=7)
    # rollout differs (noise_steps baked into the tag); encode/decode are
    # genuinely identical programs and may load from the 3-step run only if
    # their tags match — which they don't, since the tag covers the whole
    # config. So all three recompile.
    assert len(_events(g5, "load")) == 0
    assert len(list(tmp_path.glob("*.aotx"))) == n_after_3 + 3
    np.testing.assert_array_equal(out, want)


def test_prewarm_executes_loaded_runners(tmp_path):
    """prewarm() must build + execute the encode/rollout/decode runners in
    the background and record prewarm_start/prewarm_done events — the
    cold-start overlap used by the generate CLI (--no_prewarm disables)."""
    cfg = dataclasses.replace(CFG, aot_dir=str(tmp_path))
    g1 = VideoGenerator.load("", "", cfg)
    g1.generate(_prompt(g1), num_frames=4, seed=3)  # populate the cache

    g2 = VideoGenerator.load("", "", cfg)
    t = g2.prewarm(num_frames=4, batch_size=1)
    assert len(_events(g2, "prewarm_start")) == 1
    t.join(timeout=300)
    assert not t.is_alive()
    assert len(_events(g2, "prewarm_done")) == 1, g2._aot.events
    assert not _events(g2, "prewarm_failed")
    # the real call after prewarm stays bit-identical to the cold path
    np.testing.assert_array_equal(
        np.asarray(g2.generate(_prompt(g2), num_frames=4, seed=3)),
        np.asarray(g1.generate(_prompt(g1), num_frames=4, seed=3)))
