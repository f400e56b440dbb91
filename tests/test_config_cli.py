"""Config and CLI surface tests: reference-key YAML compatibility, misspelled
key tolerance, scientific-notation coercion, generate-CLI flag parity, and
the LR schedule against the HF implementation the reference uses."""

import numpy as np
import pytest

from gtax.train.config import TrainingConfig
from gtax.train.optim import cosine_min_lr_schedule


def test_repo_configs_load():
    for path in ("configs/train_dit.yaml", "configs/train_dit_actions.yaml",
                 "configs/train_dit_dummy.yaml"):
        cfg = TrainingConfig.from_yaml(path)
        assert cfg.noise_abs_max == 20.0
        assert isinstance(cfg.learning_rate, float)


def test_reference_key_set_parses():
    """The reference's exact YAML keys (train_dit.yaml, incl. the misspelled
    warnup_ratio) must load unchanged."""
    raw = dict(
        vae_checkpoint="checkpoints/vit-l-20.safetensors",
        pretrained_model="checkpoints/dit.safetensors",
        model_name="dit_training", learning_rate="1e-4",
        min_learning_rate="1e-4", warnup_ratio=0.05, batch_size=16,
        gradient_accumulation_steps=1, validation_batch_size=16,
        dataset_type="hfdataset", weight_decay=0.0, num_epochs=30,
        max_steps=-1, validation_steps=10000, save_every=10000,
        output_dir="checkpoints", logging_steps=10, seed=42, use_wandb=True,
        ddim_noise_steps=50, ddim_noise_steps_inference=100,
        ctx_max_noise_idx=40, noise_abs_max=20.0, n_prompt_frames=4,
        resume_from_checkpoint=True, use_action_conditioning=False,
    )
    cfg = TrainingConfig.from_dict(raw)
    assert cfg.warmup_ratio == 0.05
    assert cfg.learning_rate == 1e-4  # string scientific notation coerced
    assert cfg.ddim_noise_steps_inference == 100


def test_unknown_key_rejected():
    with pytest.raises(ValueError):
        TrainingConfig.from_dict({"not_a_key": 1})


def test_cosine_min_lr_schedule_matches_hf():
    """Parity with transformers.get_cosine_with_min_lr_schedule_with_warmup
    (num_cycles=0.25, min_lr) — the reference's scheduler
    (train_dit.py:254-260)."""
    try:
        import torch
        from transformers.optimization import (
            get_cosine_with_min_lr_schedule_with_warmup,
        )
    except ImportError:
        pytest.skip("transformers unavailable")
    lr, min_lr, warmup, total = 1e-4, 1e-5, 50, 1000
    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    sched = get_cosine_with_min_lr_schedule_with_warmup(
        opt, num_warmup_steps=warmup, num_training_steps=total,
        num_cycles=0.25, min_lr=min_lr,
    )
    ours = cosine_min_lr_schedule(lr, min_lr, warmup, total)
    for step in [0, 1, 25, 50, 51, 200, 500, 900, 999]:
        want = lr * sched.lr_lambdas[0](step)
        got = float(ours(step))
        np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=f"step {step}")


def test_generate_cli_e2e_debug(tmp_path):
    """Checkpoint-free generate CLI smoke: DiT-debug + vae-debug presets,
    random weights, start-frame + actions path (the path the reference
    crashes on — SURVEY.md quirk 3), real mp4 written."""
    import numpy as np
    from PIL import Image

    from gtax.cli.generate import main

    start = tmp_path / "start.png"
    Image.fromarray(
        np.random.randint(0, 255, (48, 64, 3), np.uint8)
    ).save(start)
    out = tmp_path / "vid.mp4"
    pixels = main([
        "--total-frames", "6", "--noise_steps", "3",
        "--dit_model", "DiT-debug", "--vae_model", "vae-debug",
        "--dit_model_path", "", "--vae_model_path", "",
        "--use_actions", "--start_frame", str(start),
        "--output_path", str(out), "--dtype", "float32",
        "--attention_backend", "xla", "--seed", "0",
    ])
    assert out.exists() and out.stat().st_size > 0
    assert pixels.shape == (6, 48, 64, 3), pixels.shape  # (T, H, W, 3)
    assert np.isfinite(pixels).all()


def test_generate_cli_flag_parity():
    """The generate CLI exposes the reference's flags (generate.py:71-120)."""
    from gtax.cli.generate import build_parser

    parser = build_parser()
    args = parser.parse_args([
        "--total-frames", "8", "--dit_model_path", "a", "--vae_model_path",
        "b", "--noise_steps", "20", "--use_actions", "--output_path", "o.mp4",
        "--start_frame", "img.jpg",
    ])
    assert args.total_frames == 8
    assert args.noise_steps == 20
    assert args.use_actions and args.start_frame == "img.jpg"


def test_export_cli_roundtrip(tmp_path):
    """gtax.cli.export converts an orbax train checkpoint to
    reference-format safetensors that load back identically."""
    import jax
    import numpy as np

    from gtax.cli.export import main as export_main
    from gtax.io import safetensors_port as port
    from gtax.data.loader import Batch, DataLoader
    from gtax.data.dummy import DummyDataset
    from gtax.models.dit import DiT_MODELS, dit_init
    from gtax.models.vae import VAE_MODELS, vae_init
    from gtax.train.config import TrainingConfig
    from gtax.train.trainer import Trainer

    dit_cfg = DiT_MODELS["DiT-debug"]()
    vae_cfg = VAE_MODELS["vae-debug"]()
    config = TrainingConfig.from_dict(dict(
        dataset_type="dummy", batch_size=2, num_epochs=1, max_steps=1,
        ddim_noise_steps=4, ctx_max_noise_idx=2, n_prompt_frames=4,
        use_wandb=False, use_action_conditioning=True, learning_rate=1e-3,
        output_dir=str(tmp_path), compute_dtype="float32",
        validation_steps=0, save_every=1, model_name="dit_debug",
    ))
    key = jax.random.PRNGKey(0)
    trainer = Trainer(config, total_dataset_size=8, dit_cfg=dit_cfg,
                      vae_cfg=vae_cfg, dit_params=dit_init(key, dit_cfg),
                      vae_params=vae_init(key, vae_cfg))
    ds = DummyDataset("train", return_actions=True,
                      height=vae_cfg.input_height, width=vae_cfg.input_width)
    b = next(iter(DataLoader(ds, batch_size=2, num_workers=1)))
    trainer.train_step(Batch(video=np.stack([b.video]),
                             actions=np.stack([b.actions])))
    trainer.global_step = 1
    trainer.save_checkpoint(epoch=0)

    out = str(tmp_path / "exported.safetensors")
    ckpt = str(tmp_path / "train_checkpoints" / "dit_debug_last")
    export_main([ckpt, "--out", out, "--dit_model", "DiT-debug"])

    # the exported torch-layout dict must match a direct conversion of the
    # live trained params bit-for-bit
    torch_sd = port.dit_to_torch(jax.device_get(trainer.dit_params),
                                 dit_cfg)
    from safetensors.numpy import load_file

    exported = load_file(out)
    assert set(exported) == set(torch_sd)
    for k in torch_sd:
        np.testing.assert_array_equal(exported[k], np.asarray(torch_sd[k]))


def test_batch_distinct_flag():
    from gtax.cli.generate import build_parser, main

    args = build_parser().parse_args(["--batch", "4", "--batch_distinct"])
    assert args.batch_distinct and args.batch == 4
    with pytest.raises(AssertionError, match="batch_distinct"):
        main(["--batch", "2", "--batch_distinct", "--start_frame", "x.png"])
