"""Training configuration.

Parity target: the reference's 27-field TrainingConfig dataclass + YAML loader
(/root/reference/train_dit.py:128-170). Same keys and defaults so reference
YAML configs run unchanged; `warnup_ratio` [sic] is accepted alongside the
corrected `warmup_ratio`. TPU-specific extras live at the bottom.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import yaml


@dataclasses.dataclass
class TrainingConfig:
    vae_checkpoint: str = "checkpoints/vit-l-20.safetensors"
    learning_rate: float = 1e-5
    weight_decay: float = 0.01
    batch_size: int = 16
    num_epochs: int = 5
    save_every: int = 2000
    gradient_accumulation_steps: int = 2
    seed: int = 42
    use_wandb: bool = True
    output_dir: str = "checkpoints"
    ddim_noise_steps: int = 16
    ddim_noise_steps_inference: int = 16
    ctx_max_noise_idx: int = 3
    noise_abs_max: float = 20.0
    n_prompt_frames: int = 1
    min_learning_rate: float = 1e-6
    validation_batch_size: int = 8
    max_steps: int = -1
    validation_steps: int = 2000
    logging_steps: int = 5
    use_action_conditioning: bool = True
    warmup_ratio: float = 0.05
    max_grad_norm: float = 1.0
    dataset_type: str = "webdataset"  # webdataset | hfdataset | dummy
    pretrained_model: Optional[str] = None
    model_name: str = "dit"
    resume_from_checkpoint: bool = True

    # --- TPU-native extras (defaults preserve reference behaviour) ---
    dit_model: str = "DiT-S/2"           # gtax.models.dit.DiT_MODELS key
    vae_model: str = "vit-l-20-shallow-encoder"  # gtax.models.vae.VAE_MODELS
    compute_dtype: str = "bfloat16"      # activations dtype on device
    mesh_data: int = -1                  # -1: all devices on the data axis
    mesh_model: int = 1                  # >1 enables tensor parallelism
    attention_backend: str = "xla"       # xla | pallas | fused (inference)
    int8_forward: bool = False           # W8A8 train-forward GEMMs (needs a
    #                                      fused backend; bf16 backward)
    remat: bool = False                  # jax.checkpoint the DiT blocks
    mu_bf16: bool = False                # Adam first moment in bfloat16
    profile_dir: Optional[str] = None    # jax.profiler trace output
    unstack_train: bool = True           # per-block weight pytrees + Python
    #   block loop instead of lax.scan over stacked weights: no weight
    #   slicing / stacked-grad dynamic-update-slice in the step HLO
    #   (246 -> 198 ms at flagship B=8, docs/PERF.md round 3). Layout is
    #   per-run: resuming an orbax checkpoint requires the same setting.
    validation_max_batches: int = 0      # 0: iterate the WHOLE val split
    #   (reference validation() walks the full loader, train_dit.py:711-744;
    #    set >0 to cap for quick sanity runs)

    @classmethod
    def from_yaml(cls, path: str) -> "TrainingConfig":
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> "TrainingConfig":
        raw = dict(raw)
        # the reference's misspelled key (train_dit.py:151)
        if "warnup_ratio" in raw and "warmup_ratio" not in raw:
            raw["warmup_ratio"] = raw.pop("warnup_ratio")
        raw.pop("warnup_ratio", None)
        fields = {f.name for f in dataclasses.fields(cls)}
        unknown = set(raw) - fields
        if unknown:
            raise ValueError(f"Unknown config keys: {sorted(unknown)}")
        cfg = cls(**raw)
        # scientific-notation strings -> float (reference from_yaml :163-169)
        for name in ("learning_rate", "min_learning_rate", "weight_decay",
                     "noise_abs_max", "warmup_ratio"):
            setattr(cfg, name, float(getattr(cfg, name)))
        return cfg

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)
