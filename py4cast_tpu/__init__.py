"""py4cast_tpu — a TPU-native (JAX/XLA/Pallas) neural weather-emulation framework.

Re-designed from scratch with the capability surface of meteofrance/py4cast
(reference layout documented in SURVEY.md). The compute path is JAX/Flax with
Pallas TPU kernels for hot ops; data loading is a host-side numpy pipeline;
scale-out is jax.sharding over an explicit device mesh.
"""

__version__ = "0.1.0"

from py4cast_tpu.named_tensor import NamedArray  # noqa: F401
