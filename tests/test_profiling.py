"""MFU accounting: the peak-FLOPs lookup must match REAL jax device_kind
strings (v5e reports "TPU v5 lite", not "tpu v5e" — the round-2 miss sent
it to the 100e12 fallback and overstated MFU ~2x)."""

import pytest

from gtax.utils.profiling import MFUCounter


@pytest.mark.parametrize("kind,peak", [
    ("TPU v5 lite", 197e12),     # real v5e device_kind
    ("TPU v5e", 197e12),
    ("TPU v6 lite", 918e12),     # real v6e device_kind
    ("TPU v5p", 459e12),
    ("TPU v4", 275e12),
    ("cpu", 1e12),
    ("SomeFutureChip", 100e12),  # fallback
])
def test_peak_for_kind(kind, peak):
    assert MFUCounter.peak_for_kind(kind) == peak


def test_mfu_math():
    c = MFUCounter(flops_per_step=1e12, n_devices=2, peak_per_device=2e12)
    assert c.mfu(0.5) == pytest.approx(0.5)
