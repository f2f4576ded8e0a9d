"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's tests/conftest.py role (device hygiene between
tests) the TPU-native way: JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count=8 lets every sharding/collective
test execute a real multi-device program without TPU hardware, and Pallas
kernels run in interpreter mode (see sgl_kernel_tpu.utils.pallas_interpret).
"""

import os

# The axon sitecustomize pre-imports jax with JAX_PLATFORMS=axon, so env vars
# are too late — override via jax.config before the backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: the suite is compile-dominated (hundreds of
# distinct jit programs); cached reruns cut wall time several-fold
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def assert_close(a, b, rtol=1e-5, atol=1e-5, msg=""):
    np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=rtol, atol=atol, err_msg=msg)
