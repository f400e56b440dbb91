"""Quality metrics (PSNR/SSIM) sanity properties."""

import numpy as np
import pytest

from gtax.utils.metrics import per_frame_ssim, psnr, ssim


def test_psnr_identity_and_noise():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
    assert psnr(img, img) == float("inf")
    noisy = np.clip(img.astype(int)
                    + rng.integers(-10, 10, img.shape), 0, 255)
    assert 20 < psnr(img, noisy) < 40


def test_ssim_properties():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
    assert ssim(img, img) == pytest.approx(1.0)
    light = np.clip(img.astype(int) + rng.integers(-5, 5, img.shape),
                    0, 255)
    heavy = rng.integers(0, 255, img.shape)
    s_light, s_heavy = ssim(img, light), ssim(img, heavy)
    assert 0.5 < s_light < 1.0
    assert s_heavy < s_light  # monotone in distortion
    # per-frame wrapper
    vid = np.stack([img, img])
    out = per_frame_ssim(vid, np.stack([img, light]))
    assert out[0] == pytest.approx(1.0) and out[1] == s_light
