"""Keyboard-action encoding.

Parity target: /root/reference/web_dataset.py:22-38 (actions_to_one_hot) and
/root/reference/utils.py:3 — 25-way one-hot per frame in VPT-derived key
format; -1 encodes "no action" (zero vector); index 3 is "W"/forward
(generate.py:159,181).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from gtax.core.constants import ACTION_DIM, ACTION_FORWARD_INDEX


def actions_to_one_hot(actions: Sequence[int], dim: int = ACTION_DIM) -> np.ndarray:
    """(T,) ints in [-1, dim) -> (T, dim) float32 one-hot; -1 -> zeros."""
    actions = np.asarray(actions, dtype=np.int64)
    out = np.zeros((len(actions), dim), dtype=np.float32)
    mask = actions >= 0
    out[np.arange(len(actions))[mask], actions[mask]] = 1.0
    return out


def forward_actions(batch: int, frames: int, dim: int = ACTION_DIM) -> np.ndarray:
    """All-frames "drive straight" (W pressed) actions, the rollout filler
    used by the reference (generate.py:173-181, train_dit.py:383-394)."""
    out = np.zeros((batch, frames, dim), dtype=np.float32)
    out[:, :, ACTION_FORWARD_INDEX] = 1.0
    return out
