import os

# Tests run on a virtual 8-device CPU mesh — the TPU-native analogue of a
# fake distributed backend (SURVEY.md §4). Must be set before jax imports.
# GTAX_TPU_TESTS=1 keeps the real accelerator visible for the on-chip lane
# (tests/test_tpu_onchip.py).
_TPU_LANE = os.environ.get("GTAX_TPU_TESTS") == "1"
if not _TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# The axon site package re-pins JAX_PLATFORMS at import time; the config
# update below wins over it and guarantees the virtual 8-CPU mesh.
import jax  # noqa: E402

if not _TPU_LANE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="session")
def golden():
    def load(name):
        path = os.path.join(GOLDEN, name)
        if not os.path.exists(path):
            pytest.skip(f"golden fixture {name} missing — run scripts/gen_golden.py")
        return np.load(path)

    return load


def assert_close(a, b, atol=1e-5, rtol=1e-5, name=""):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    assert a.shape == b.shape, f"{name}: shape {a.shape} vs {b.shape}"
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=name)
