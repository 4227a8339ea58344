"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes — this file is imported by
pytest before any test module imports jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# keep test caches out of the user's real data root
os.environ.setdefault("PY4CAST_TPU_ROOTDIR", "/tmp/py4cast_tpu_tests")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    import jax

    return jax.devices()
