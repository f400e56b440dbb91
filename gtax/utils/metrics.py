"""Quality metrics for the parity gate (BASELINE.md: per-frame PSNR vs the
torch reference output)."""

from __future__ import annotations

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, max_val: float = 255.0) -> float:
    """Peak signal-to-noise ratio in dB between two images/videos."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(max_val**2 / mse))


def per_frame_psnr(video_a: np.ndarray, video_b: np.ndarray,
                   max_val: float = 255.0) -> list[float]:
    """PSNR per frame for (T, H, W, C) uint8 videos."""
    assert video_a.shape == video_b.shape, (video_a.shape, video_b.shape)
    return [psnr(fa, fb, max_val) for fa, fb in zip(video_a, video_b)]
