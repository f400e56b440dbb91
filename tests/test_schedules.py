"""Golden-value parity of the beta schedules against the torch reference."""

import numpy as np

from gtax.core import schedules
from tests.conftest import assert_close


def test_sigmoid_schedule_parity(golden):
    g = golden("schedules.npz")
    for clamp in (1e-4, 1e-6):
        betas = schedules.sigmoid_beta_schedule(1000, clamp_min=clamp)
        assert_close(betas, g[f"sigmoid_{clamp:g}"], atol=1e-7, rtol=1e-4, name=f"betas {clamp}")
        abar = schedules.alphas_cumprod_from_betas(betas)
        assert_close(
            abar, g[f"sigmoid_{clamp:g}_abar"], atol=1e-6, rtol=1e-4, name=f"abar {clamp}"
        )


def test_sigmoid_variants_parity(golden):
    g = golden("schedules.npz")
    assert_close(
        schedules.sigmoid_beta_schedule_clamped(1000), g["sigmoid_clamped"], atol=1e-7, rtol=1e-4
    )
    assert_close(schedules.sigmoid_beta_schedule_og(1000), g["sigmoid_og"], atol=1e-7, rtol=1e-4)
    # reference computes the cosine schedule in float32; allow that noise
    assert_close(schedules.cosine_beta_schedule(1000), g["cosine"], atol=2e-5, rtol=2e-3)
    assert_close(schedules.linear_beta_schedule(1000), g["linear"], atol=1e-7)


def test_ddim_noise_range(golden):
    g = golden("schedules.npz")
    nr = schedules.ddim_noise_range(50, 1000)
    assert np.array_equal(np.asarray(nr), g["noise_range_50"])
    assert nr[0] == 0 and nr[-1] == 999


def test_make_diffusion_constants():
    betas, abar, nr, stab = schedules.make_diffusion_constants(50)
    assert betas.shape == (1000,) and abar.shape == (1000,)
    assert nr.shape == (51,)
    # stabilization_level = noise_range[1] (reference train_dit.py:327)
    assert stab == int(np.linspace(0, 999, 51).astype(np.int64)[1])
