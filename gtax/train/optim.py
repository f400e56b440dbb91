"""Optimizer and LR schedule.

Parity targets:
  - AdamW betas (0.9, 0.999), eps 1e-7, configurable lr/wd
    (/root/reference/train_dit.py:232-238)
  - HF get_cosine_with_min_lr_schedule_with_warmup with num_cycles=0.25 and
    min_lr (train_dit.py:254-260): linear warmup, then
    factor = max(0, 0.5*(1+cos(pi*2*0.25*progress)))
    scaled into [min_lr/lr, 1].
  - global-norm clip at max_grad_norm (train_dit.py:965-967)
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def cosine_min_lr_schedule(
    learning_rate: float,
    min_learning_rate: float,
    warmup_steps: int,
    total_steps: int,
    num_cycles: float = 0.25,
):
    """Replicates transformers' get_cosine_with_min_lr_schedule_with_warmup."""
    min_ratio = min_learning_rate / learning_rate if learning_rate > 0 else 0.0

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        denom = jnp.maximum(1.0, total_steps - warmup_steps)
        progress = (step - warmup_steps) / denom
        factor = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * 2.0 * num_cycles * progress))
        )
        factor = factor * (1.0 - min_ratio) + min_ratio
        factor = jnp.maximum(0.0, factor)
        return learning_rate * jnp.where(step < warmup_steps, warm, factor)

    return schedule


_FROZEN_KEYS = {"spatial_rope_freqs", "temporal_rope_freqs"}


def _decay_mask(params):
    """False for the rope frequency tables: the reference keeps them frozen
    (RotaryEmbedding learned_freq=False — rotary_embedding_torch.py:138-144),
    so the torch optimizer never sees them. Their gradients are already
    stop_gradient-zeroed (gtax/models/dit.py), but AdamW's decoupled weight
    decay applies wd*p regardless of gradient — unmasked it would shrink the
    tables toward zero every step and drift positions away from the shipped
    checkpoints."""
    import jax

    def mask(path, _leaf):
        keys = {str(getattr(p, "key", p)) for p in path}
        return not (keys & _FROZEN_KEYS)

    return jax.tree_util.tree_map_with_path(mask, params)


def make_optimizer(
    learning_rate: float,
    min_learning_rate: float,
    warmup_steps: int,
    total_steps: int,
    weight_decay: float = 0.0,
    max_grad_norm: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-7,
    mu_dtype=None,
):
    """mu_dtype: storage dtype for Adam's first moment (e.g. jnp.bfloat16
    halves that buffer on memory-tight single-chip runs; update math is
    unchanged — optax upcasts before use)."""
    schedule = cosine_min_lr_schedule(
        learning_rate, min_learning_rate, warmup_steps, total_steps
    )
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(schedule, b1=b1, b2=b2, eps=eps,
                    weight_decay=weight_decay, mu_dtype=mu_dtype,
                    mask=_decay_mask),
    )
    return tx, schedule
