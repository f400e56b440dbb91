"""End-to-end training smoke tests on the dummy dataset (tiny models), plus
checkpoint save/resume and data-parallel sharding over the virtual 8-CPU mesh.

This formalises the reference's de-facto integration test (SURVEY.md §4: the
dummy dataset + full train loop) into a real pytest.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtax.models.dit import DiTConfig, dit_init
from gtax.models.vae import VAEConfig, vae_init
from gtax.parallel import mesh as meshlib
from gtax.train.config import TrainingConfig
from gtax.train.trainer import Trainer, encode_frames, decode_frames
from gtax.data.dummy import DummyDataset
from gtax.data.loader import DataLoader

# latent geometry must agree: VAE 48x64/patch8 -> 6x8 tokens of dim 4 ==
# DiT input (4, 6, 8)
TINY_DIT = DiTConfig(
    input_h=6, input_w=8, patch_size=2, in_channels=4, hidden_size=32,
    depth=2, num_heads=2, mlp_ratio=2.0, external_cond_dim=25, max_frames=5,
)
TINY_VAE = VAEConfig(
    latent_dim=4, input_height=48, input_width=64, patch_size=8,
    enc_dim=32, enc_depth=1, enc_heads=2, dec_dim=32, dec_depth=1,
    dec_heads=2, mlp_ratio=2.0,
)
FRAME_HW = (48, 64)


def tiny_trainer(tmp_path, **cfg_overrides):
    base = dict(
        dataset_type="dummy", batch_size=2, validation_batch_size=2,
        num_epochs=1, max_steps=3, gradient_accumulation_steps=1,
        ddim_noise_steps=8, ddim_noise_steps_inference=4, ctx_max_noise_idx=3,
        n_prompt_frames=4, use_wandb=False, use_action_conditioning=True,
        learning_rate=1e-3, min_learning_rate=1e-4, weight_decay=0.0,
        output_dir=str(tmp_path), compute_dtype="float32",
        validation_steps=0, save_every=0, logging_steps=1,
    )
    base.update(cfg_overrides)
    config = TrainingConfig.from_dict(base)
    key = jax.random.PRNGKey(0)
    trainer = Trainer(
        config, total_dataset_size=64,
        dit_cfg=TINY_DIT, vae_cfg=TINY_VAE,
        dit_params=dit_init(key, TINY_DIT),
        vae_params=vae_init(key, TINY_VAE),
    )
    return trainer, config


def dummy_batches(n, batch, with_actions=True):
    ds = DummyDataset("train", return_actions=with_actions,
                      height=FRAME_HW[0], width=FRAME_HW[1])
    loader = DataLoader(ds, batch_size=batch, num_workers=1)
    it = iter(loader)
    return [next(it) for _ in range(n)]


def test_vae_roundtrip_shapes():
    key = jax.random.PRNGKey(0)
    vae_params = vae_init(key, TINY_VAE)
    frames = jnp.ones((2, 5, 3, *FRAME_HW)) * 0.5
    lat = encode_frames(vae_params, TINY_VAE, frames, jnp.float32)
    assert lat.shape == (2, 5, 4, TINY_VAE.seq_h, TINY_VAE.seq_w)
    pix = decode_frames(vae_params, TINY_VAE, lat, jnp.float32)
    assert pix.shape == (2, 5, *FRAME_HW, 3) and pix.dtype == jnp.uint8


@pytest.mark.slow
def test_train_loss_decreases(tmp_path):
    trainer, _ = tiny_trainer(tmp_path)
    from gtax.data.loader import Batch

    b = dummy_batches(1, 2)[0]
    losses = []
    for step in range(6):
        video = np.stack([b.video])  # leading accumulation dim
        actions = np.stack([b.actions])
        metrics = trainer.train_step_sync(
            Batch(video=video, actions=actions))
        losses.append(metrics["train_loss"])
    assert np.isfinite(losses).all()
    # same constant batch: optimisation must reduce the loss
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_checkpoint_save_resume(tmp_path):
    trainer, config = tiny_trainer(tmp_path)
    b = dummy_batches(1, 2)[0]
    from gtax.data.loader import Batch

    batch = Batch(video=np.stack([b.video]), actions=np.stack([b.actions]))
    trainer.train_step(batch)
    trainer.global_step = 7
    trainer.save_checkpoint(epoch=0)
    trainer.save_model(epoch=0)

    # weight export exists
    exports = [f for f in os.listdir(tmp_path) if f.endswith(".safetensors")]
    assert exports, os.listdir(tmp_path)

    trainer2, _ = tiny_trainer(tmp_path)
    assert trainer2.try_resume()
    assert trainer2.global_step == 7
    for a, b2 in zip(jax.tree.leaves(trainer.dit_params),
                     jax.tree.leaves(trainer2.dit_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))


def test_safetensors_export_loads_back(tmp_path):
    from gtax.io import safetensors_port as port
    from gtax.models.dit import restack_params

    trainer, config = tiny_trainer(tmp_path)
    trainer.save_model(epoch=0)
    path = os.path.join(
        str(tmp_path), f"{config.model_name}_epoch_1_0.safetensors"
    )
    params = port.load_dit(path, TINY_DIT, verbose=False)
    # the trainer runs the unstacked per-block layout (unstack_train);
    # exports are always the stacked reference layout
    restacked = restack_params(trainer.dit_params, TINY_DIT)
    for a, b in zip(jax.tree.leaves(restacked), jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_data_parallel_step_multi_device(tmp_path):
    """Train step over the full virtual 8-device mesh: batch sharded on
    'data', identical math to single-device."""
    assert jax.device_count() == 8, jax.devices()
    trainer, _ = tiny_trainer(tmp_path)
    assert trainer.n_devices == 8
    b = dummy_batches(1, 16)[0]  # global batch 16 -> 2 per device
    from gtax.data.loader import Batch

    video = np.stack([b.video])
    actions = np.stack([b.actions])
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(trainer.mesh, P(None, "data"))
    batch = Batch(
        video=jax.device_put(video, sharding),
        actions=jax.device_put(actions, sharding),
    )
    metrics = trainer.train_step_sync(batch)
    assert np.isfinite(metrics["train_loss"])


@pytest.mark.slow
def test_tensor_parallel_mesh(tmp_path):
    """data=4 x model=2 mesh: block kernels shard over 'model' and the step
    still runs and produces finite loss."""
    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=4, model=2))
    config = TrainingConfig.from_dict(dict(
        dataset_type="dummy", batch_size=1, num_epochs=1, max_steps=1,
        gradient_accumulation_steps=1, ddim_noise_steps=4,
        ctx_max_noise_idx=2, n_prompt_frames=4, use_wandb=False,
        learning_rate=1e-3, output_dir=str(tmp_path),
        compute_dtype="float32", mesh_data=4, mesh_model=2,
        validation_steps=0, save_every=0,
    ))
    key = jax.random.PRNGKey(0)
    trainer = Trainer(
        config, total_dataset_size=64, dit_cfg=TINY_DIT, vae_cfg=TINY_VAE,
        dit_params=dit_init(key, TINY_DIT),
        vae_params=vae_init(key, TINY_VAE), mesh=mesh,
    )
    # verify some kernels actually sharded over 'model'
    from jax.sharding import PartitionSpec
    specs = jax.tree.map(lambda s: s.spec, trainer.param_sharding)
    flat = jax.tree.leaves(specs,
                           is_leaf=lambda x: isinstance(x, PartitionSpec))
    assert any("model" in (spec or ()) for spec in flat), flat
    b = dummy_batches(1, 4)[0]
    from gtax.data.loader import Batch

    batch = Batch(video=np.stack([b.video]), actions=np.stack([b.actions]))
    metrics = trainer.train_step_sync(batch)
    assert np.isfinite(metrics["train_loss"])


def test_predict_noise_diagnostics(tmp_path, monkeypatch):
    """renoise eval returns distinct, truthful tensors for the debug grid
    (reference predict_noise + visualize_step, train_dit.py:466-552)."""
    trainer, _ = tiny_trainer(tmp_path)
    b = dummy_batches(1, 2)[0]
    from gtax.data.loader import Batch

    monkeypatch.chdir(tmp_path)  # restored after the test
    out = trainer.predict_noise(Batch(video=b.video, actions=b.actions))
    assert out.shape == (1, 5, 4, TINY_VAE.seq_h, TINY_VAE.seq_w)
    # the jitted renoise returns the full diagnostics dict
    latents = encode_frames(trainer.vae_params, TINY_VAE,
                            jnp.asarray(b.video[:1]), jnp.float32)
    diag = trainer._rollout_cache["renoise"](
        trainer.dit_params, latents, jnp.asarray(b.actions[:1]),
        jax.random.PRNGKey(0),
    )
    x_noisy, noise, v = diag["x_noisy"], diag["noise"], diag["v"]
    den = diag["denoised"]
    # noisy window really is ctx noised at stabilization_level-1 + pure noise
    assert not np.allclose(np.asarray(x_noisy), np.asarray(latents))
    assert not np.allclose(np.asarray(v), np.asarray(den))
    # context frames of the denoised window are the noisy context, unchanged
    np.testing.assert_array_equal(np.asarray(den[:, :-1]),
                                  np.asarray(x_noisy[:, :-1]))
    # the recorded noise reconstructs the noisy context exactly
    abar, _ = trainer.sampler_cfg.tables()
    a = abar[trainer.sampler_cfg.stabilization_level - 1]
    recon = jnp.sqrt(a) * latents[:, :-1] + jnp.sqrt(1 - a) * noise[:, :-1]
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x_noisy[:, :-1]),
                               atol=1e-6)


def test_loader_epoch_semantics():
    """Map-style datasets yield exactly one epoch per __iter__ (torch
    DataLoader parity, reference train_dit.py:920-934), reshuffled per epoch."""

    class Indexed:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            return {"video": np.full((1, 1, 2, 2), float(i), np.float32)}

    loader = DataLoader(Indexed(), batch_size=2, num_workers=1, seed=0)
    ep1 = [b.video for b in loader]
    ep2 = [b.video for b in loader]
    assert len(ep1) == 3 and len(ep2) == 3
    assert loader.epoch == 2
    ids1 = sorted(np.concatenate(ep1).ravel()[:: 4].tolist())
    ids2 = sorted(np.concatenate(ep2).ravel()[:: 4].tolist())
    assert ids1 == ids2 == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]  # same multiset
    order1 = np.concatenate(ep1).ravel()[::4].tolist()
    order2 = np.concatenate(ep2).ravel()[::4].tolist()
    assert order1 != order2  # per-epoch reshuffle


@pytest.mark.slow
def test_epoch_bounded_training(tmp_path):
    """num_epochs alone terminates training (no max_steps) and start_epoch
    advances — reference epoch semantics (train_dit.py:920-934)."""
    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=1, model=1),
                             devices=jax.devices()[:1])
    config = TrainingConfig.from_dict(dict(
        dataset_type="dummy", batch_size=2, validation_batch_size=2,
        num_epochs=2, max_steps=0, gradient_accumulation_steps=1,
        ddim_noise_steps=4, ddim_noise_steps_inference=2, ctx_max_noise_idx=2,
        n_prompt_frames=4, use_wandb=False, use_action_conditioning=True,
        learning_rate=1e-3, output_dir=str(tmp_path),
        compute_dtype="float32", validation_steps=0, save_every=0,
        logging_steps=100, resume_from_checkpoint=False,
    ))
    key = jax.random.PRNGKey(0)
    trainer = Trainer(
        config, total_dataset_size=8, dit_cfg=TINY_DIT, vae_cfg=TINY_VAE,
        dit_params=dit_init(key, TINY_DIT),
        vae_params=vae_init(key, TINY_VAE), mesh=mesh,
    )
    assert trainer.steps_per_epoch == 4
    ds = DummyDataset("train", return_actions=True, height=FRAME_HW[0],
                      width=FRAME_HW[1], size=8)
    loader = DataLoader(ds, batch_size=2, num_workers=1, seed=0)
    trainer.training_loop(loader, val_loader=None)
    assert trainer.global_step == 8  # 2 epochs x 4 steps, self-terminated
    assert trainer.start_epoch == 2
    assert loader.epoch == 2


def test_rollout_and_video(tmp_path, monkeypatch):
    trainer, _ = tiny_trainer(tmp_path)
    b = dummy_batches(1, 2)[0]
    from gtax.data.loader import Batch

    monkeypatch.chdir(tmp_path)  # restored after the test
    path = trainer.predict(Batch(video=b.video, actions=b.actions),
                           num_frames=7)
    assert os.path.exists(path)


def test_latent_cache_training_bit_identical(tmp_path):
    """Precomputed-latent training (gtax.data.latents) must produce the SAME
    losses as on-the-fly VAE encoding: latents are cached pre-scaled through
    the identical encode_frames path."""
    from gtax.data.latents import LatentCacheDataset

    class DeterministicClips:
        """index-keyed clips (DummyDataset draws actions per ACCESS, which
        would give the two runs different data)."""

        def __len__(self):
            return 8

        def __getitem__(self, i):
            rng = np.random.default_rng(100 + i)
            return {
                "video": rng.random((5, 3, *FRAME_HW), np.float32),
                "actions": rng.random((5, 25), np.float32),
            }

    ds = DeterministicClips()

    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=1, model=1),
                             devices=jax.devices()[:1])

    def run(loader):
        trainer, config = tiny_trainer(tmp_path / "out", max_steps=2)
        trainer = Trainer(
            config, total_dataset_size=8, dit_cfg=TINY_DIT,
            vae_cfg=TINY_VAE, dit_params=dit_init(jax.random.PRNGKey(0),
                                                  TINY_DIT),
            vae_params=vae_init(jax.random.PRNGKey(0), TINY_VAE), mesh=mesh)
        losses = []
        trainer.training_loop(
            loader, val_loader=None,
            callbacks=[lambda tr, m: losses.append(m["train_loss"])])
        return losses

    pixel_losses = run(DataLoader(ds, batch_size=2, num_workers=1, seed=0))

    # the cache must encode with the SAME vae params the trainer uses
    probe, _ = tiny_trainer(tmp_path / "probe", max_steps=0)
    lat_ds = LatentCacheDataset.build(
        ds, probe.vae_params, TINY_VAE, str(tmp_path / "cache"),
        encode_batch=4, compute_dtype=jnp.float32)
    assert len(lat_ds) == len(ds)
    sample = lat_ds[0]
    assert sample["latents"].shape == (5, 4, TINY_VAE.seq_h, TINY_VAE.seq_w)
    assert "actions" in sample

    lat_losses = run(DataLoader(lat_ds, batch_size=2, num_workers=1, seed=0))
    assert lat_losses == pixel_losses  # bit-identical

    # reopening the cache from disk works too
    reopened = LatentCacheDataset(str(tmp_path / "cache"))
    np.testing.assert_array_equal(reopened[3]["latents"],
                                  lat_ds[3]["latents"])


def test_full_val_split_and_step0_diagnostics(tmp_path, monkeypatch):
    """The default validation walks the ENTIRE val split (reference
    validation(), train_dit.py:711-744 — round-2 gtax silently capped at 50
    batches), and a fresh run dumps per-rank tensor stats + the in-loss
    debug grid on step 0 (reference train_dit.py:652-674, 686-699)."""
    monkeypatch.chdir(tmp_path)
    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=1, model=1),
                             devices=jax.devices()[:1])
    config = TrainingConfig.from_dict(dict(
        dataset_type="dummy", batch_size=2, validation_batch_size=2,
        num_epochs=1, max_steps=2, gradient_accumulation_steps=1,
        ddim_noise_steps=4, ddim_noise_steps_inference=2, ctx_max_noise_idx=2,
        n_prompt_frames=4, use_wandb=False, use_action_conditioning=True,
        learning_rate=1e-3, output_dir=str(tmp_path / "out"),
        compute_dtype="float32", validation_steps=0, save_every=0,
        logging_steps=100, resume_from_checkpoint=False,
    ))
    assert config.validation_max_batches == 0  # default: no cap
    trainer = Trainer(
        config, total_dataset_size=8, dit_cfg=TINY_DIT, vae_cfg=TINY_VAE,
        dit_params=dit_init(jax.random.PRNGKey(0), TINY_DIT),
        vae_params=vae_init(jax.random.PRNGKey(0), TINY_VAE), mesh=mesh,
    )
    # count val batches actually evaluated
    n_eval = {"n": 0}
    real_eval = trainer._eval_step

    def counting_eval(*a, **kw):
        n_eval["n"] += 1
        return real_eval(*a, **kw)

    trainer._eval_step = counting_eval
    val_ds = DummyDataset("val", return_actions=True, height=FRAME_HW[0],
                          width=FRAME_HW[1])
    val_loader = DataLoader(val_ds, batch_size=2, num_workers=1, seed=0)
    train_ds = DummyDataset("train", return_actions=True, height=FRAME_HW[0],
                            width=FRAME_HW[1], size=4)
    train_loader = DataLoader(train_ds, batch_size=2, num_workers=1, seed=0)
    trainer.training_loop(train_loader, val_loader)
    # dummy val split has 10 samples -> 5 batches of 2, ALL evaluated
    assert n_eval["n"] == 5, n_eval
    # step-0 grid written by _step0_diagnostics (plus the renoise eval's own)
    grids = [f for f in os.listdir("debug_visualizations")
             if f.endswith("_noise_gs_0.png")]
    assert grids, os.listdir("debug_visualizations")

    # the cap still works when configured
    trainer.config.validation_max_batches = 2
    n_eval["n"] = 0
    trainer.run_validation(val_loader)
    assert n_eval["n"] == 2, n_eval


@pytest.mark.slow
def test_unstack_train_matches_stacked(tmp_path):
    """unstack_train=True (per-block weight pytrees, the round-3 default)
    must produce the same losses as the stacked-scan layout — the layout is
    a performance choice, not a math choice."""
    from gtax.data.loader import Batch

    b = dummy_batches(1, 2)[0]
    batch = Batch(video=np.stack([b.video]), actions=np.stack([b.actions]))

    def run(unstack):
        trainer, _ = tiny_trainer(tmp_path / f"u{int(unstack)}",
                                  unstack_train=unstack)
        return [trainer.train_step_sync(batch)["train_loss"]
                for _ in range(3)]

    np.testing.assert_allclose(run(True), run(False), rtol=1e-6)


def test_deferred_metrics_records_every_step_once(tmp_path):
    """The pipelined metrics path (train_step returns the PREVIOUS step's
    metrics; flush at validation/save/epoch/max_steps boundaries) must
    deliver exactly one correctly-labeled record and one callback per
    dispatched step — no gaps, no duplicates, no off-by-one."""
    import json as _json

    from gtax.parallel import mesh as meshlib

    config = TrainingConfig.from_dict(dict(
        dataset_type="dummy", batch_size=2, validation_batch_size=2,
        num_epochs=3, max_steps=5, gradient_accumulation_steps=1,
        ddim_noise_steps=8, ddim_noise_steps_inference=4,
        ctx_max_noise_idx=3, n_prompt_frames=4, use_wandb=False,
        use_action_conditioning=True, learning_rate=1e-3,
        output_dir=str(tmp_path), compute_dtype="float32",
        validation_steps=0, save_every=2, logging_steps=1))
    key = jax.random.PRNGKey(0)
    trainer = Trainer(
        config, total_dataset_size=64, dit_cfg=TINY_DIT, vae_cfg=TINY_VAE,
        dit_params=dit_init(key, TINY_DIT),
        vae_params=vae_init(key, TINY_VAE),
        mesh=meshlib.make_mesh(meshlib.MeshConfig(data=1, model=1),
                               devices=jax.devices()[:1]))
    ds = DummyDataset("train", return_actions=True,
                      height=FRAME_HW[0], width=FRAME_HW[1], size=8)
    loader = DataLoader(ds, batch_size=2, num_workers=1, seed=0)
    seen = []
    trainer.training_loop(loader, val_loader=None,
                          callbacks=[lambda tr, m: seen.append(m)])
    assert trainer.global_step == 5
    assert len(seen) == 5, len(seen)
    path = tmp_path / f"{config.model_name}_metrics.jsonl"
    recs = [_json.loads(l) for l in open(path)]
    steps = [r["step"] for r in recs if "train_loss" in r]
    assert steps == [1, 2, 3, 4, 5], steps
    assert all("step_time_s" in r for r in recs if "train_loss" in r)
