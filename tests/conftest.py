"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The environment may pin JAX_PLATFORMS to a TPU plugin (e.g. axon), and a
sitecustomize may set jax.config.jax_platforms directly — so we both
override the env var and force the config after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# keep test caches out of the user's real data root
os.environ.setdefault("PY4CAST_TPU_ROOTDIR", "/tmp/py4cast_tpu_tests")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices()
