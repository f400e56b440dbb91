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


def ssim(a: np.ndarray, b: np.ndarray, max_val: float = 255.0,
         win: int = 8) -> float:
    """Structural similarity for (H, W, C) images (Wang et al. 2004),
    uniform win x win windows (non-overlapping — the cheap variant; a
    secondary signal next to the PSNR gates, not a replacement)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    H, W = a.shape[:2]
    h, w = H - H % win, W - W % win
    # (nh, nw, win, win, C) tiles
    def tiles(x):
        x = x[:h, :w]
        x = x.reshape(h // win, win, w // win, win, -1)
        return x.transpose(0, 2, 1, 3, 4).reshape(h // win, w // win, -1)

    ta, tb = tiles(a), tiles(b)
    mu_a, mu_b = ta.mean(-1), tb.mean(-1)
    var_a, var_b = ta.var(-1), tb.var(-1)
    cov = (ta * tb).mean(-1) - mu_a * mu_b
    c1, c2 = (0.01 * max_val) ** 2, (0.03 * max_val) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2))
    return float(s.mean())


def per_frame_ssim(video_a: np.ndarray, video_b: np.ndarray,
                   max_val: float = 255.0) -> list[float]:
    """SSIM per frame for (T, H, W, C) uint8 videos."""
    assert video_a.shape == video_b.shape, (video_a.shape, video_b.shape)
    return [ssim(fa, fb, max_val) for fa, fb in zip(video_a, video_b)]
