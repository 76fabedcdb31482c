"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on virtual CPU devices
(`xla_force_host_platform_device_count`), as real multi-chip hardware
is not available in CI. float64 support requires jax x64 mode.
"""

import os

# The axon TPU plugin ignores JAX_PLATFORMS; JAX_PLATFORM_NAME and the
# config key do force CPU. Set all three before jax initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.devices()[0].platform == "cpu", "tests must not touch the TPU"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
SCENE = "/root/reference/test/scenes/cornell_box.obj"


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN


@pytest.fixture(scope="session")
def cornell_tris():
    """The exact triangles the golden generator saw: [n, 3, 3] float32."""
    data = np.fromfile(os.path.join(GOLDEN, "tris.bin"), np.float32)
    return data.reshape(-1, 3, 3)


@pytest.fixture(scope="session")
def golden_hits():
    """Golden closest hits: structured array (prim_id, t, u, v) per ray
    of a 64x64 primary grid."""
    rec = np.dtype([("prim_id", np.uint32), ("t", np.float32),
                    ("u", np.float32), ("v", np.float32)])
    return np.fromfile(os.path.join(GOLDEN, "cornell_hits.bin"), rec)


@pytest.fixture(scope="session")
def golden_anyhit():
    return np.fromfile(os.path.join(GOLDEN, "cornell_anyhit.bin"), np.uint8)
