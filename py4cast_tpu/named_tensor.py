"""NamedArray: an immutable, jit-friendly named tensor.

TPU-native re-design of the reference's mutable ``NamedTensor`` wrapper
(reference API surface: doc/features.md:124-179 and usages listed in
SURVEY.md §2). Key differences, by design:

- **Frozen pytree dataclass.** ``names`` (dim names) and ``feature_names``
  are static aux data, so everything name-related is resolved at trace time
  and ``jax.jit`` sees only array shapes. No in-place ops: every transform
  returns a new ``NamedArray``.
- Works with both ``numpy`` arrays (host-side data pipeline) and
  ``jax.Array`` (device-side compute) — ops are dispatched through the
  array's own namespace where possible.

Conventions inherited from the reference:
- the last dim is always ``features`` and ``feature_names`` labels it;
- spatial dims are every dim not named ``batch``/``timestep``/``features``.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

NON_SPATIAL = ("batch", "timestep", "features", "members")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class NamedArray:
    """A tensor + dimension names + feature names (static metadata)."""

    array: Union[np.ndarray, jax.Array]
    names: Tuple[str, ...]
    feature_names: Tuple[str, ...]

    def __post_init__(self):
        object.__setattr__(self, "names", tuple(self.names))
        object.__setattr__(self, "feature_names", tuple(self.feature_names))
        if hasattr(self.array, "ndim") and self.array.ndim != len(self.names):
            raise ValueError(
                f"NamedArray rank mismatch: array ndim={self.array.ndim} "
                f"vs names={self.names}"
            )
        if (
            hasattr(self.array, "shape")
            and "features" in self.names
            and not _is_tracing(self.array)
            and self.array.shape[self.names.index("features")]
            != len(self.feature_names)
        ):
            raise ValueError(
                f"features dim has size "
                f"{self.array.shape[self.names.index('features')]} but "
                f"{len(self.feature_names)} feature names given: "
                f"{self.feature_names}"
            )

    # ---------------------------------------------------------------- pytree
    def tree_flatten(self):
        return (self.array,), (self.names, self.feature_names)

    @classmethod
    def tree_unflatten(cls, aux, children):
        names, feature_names = aux
        obj = object.__new__(cls)
        object.__setattr__(obj, "array", children[0])
        object.__setattr__(obj, "names", names)
        object.__setattr__(obj, "feature_names", feature_names)
        return obj

    # ------------------------------------------------------------- metadata
    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.array.shape)

    @property
    def ndim(self) -> int:
        return len(self.names)

    @property
    def dtype(self):
        return self.array.dtype

    def dim_index(self, name: str) -> int:
        """Index of the dim with the given name."""
        return self.names.index(name)

    def dim_size(self, name: str) -> int:
        return self.array.shape[self.dim_index(name)]

    @property
    def spatial_dim_idx(self) -> List[int]:
        """Indices of spatial dims (everything but batch/timestep/features)."""
        return [i for i, n in enumerate(self.names) if n not in NON_SPATIAL]

    @property
    def spatial_dim_names(self) -> List[str]:
        return [n for n in self.names if n not in NON_SPATIAL]

    @property
    def num_spatial_dims(self) -> int:
        return len(self.spatial_dim_idx)

    def feature_index(self, feature_name: str) -> int:
        return self.feature_names.index(feature_name)

    # ----------------------------------------------------------- transforms
    def replace(self, array) -> "NamedArray":
        """Same names, new data."""
        return NamedArray(array, self.names, self.feature_names)

    def astype(self, dtype) -> "NamedArray":
        return self.replace(self.array.astype(dtype))

    def select(self, dim_name: str, index: int) -> "NamedArray":
        """Select one index along a named dim, dropping it (not `features`)."""
        if dim_name == "features":
            raise ValueError("use __getitem__ by feature name instead")
        axis = self.dim_index(dim_name)
        new_names = self.names[:axis] + self.names[axis + 1 :]
        return NamedArray(
            _take(self.array, index, axis), new_names, self.feature_names
        )

    def select_array(self, dim_name: str, index: int):
        """Select one index along a named dim; return the raw array."""
        return _take(self.array, index, self.dim_index(dim_name))

    def index_select(self, dim_name: str, indices: Sequence[int]) -> "NamedArray":
        """Gather several indices along a named dim (dim is kept)."""
        axis = self.dim_index(dim_name)
        xp = _xp(self.array)
        return self.replace(xp.take(self.array, xp.asarray(list(indices)), axis=axis))

    def slice_dim(self, dim_name: str, start: int, stop: int) -> "NamedArray":
        axis = self.dim_index(dim_name)
        sl = [slice(None)] * self.ndim
        sl[axis] = slice(start, stop)
        return self.replace(self.array[tuple(sl)])

    def unsqueeze(self, dim_name: str, dim_index: int) -> "NamedArray":
        xp = _xp(self.array)
        new_names = self.names[:dim_index] + (dim_name,) + self.names[dim_index:]
        return NamedArray(
            xp.expand_dims(self.array, dim_index), new_names, self.feature_names
        )

    def squeeze(self, dim_names: Union[str, Sequence[str]]) -> "NamedArray":
        if isinstance(dim_names, str):
            dim_names = [dim_names]
        arr, names = self.array, list(self.names)
        xp = _xp(arr)
        for dn in dim_names:
            axis = names.index(dn)
            if arr.shape[axis] != 1:
                raise ValueError(f"cannot squeeze dim {dn} of size {arr.shape[axis]}")
            arr = xp.squeeze(arr, axis=axis)
            names.pop(axis)
        return NamedArray(arr, tuple(names), self.feature_names)

    def flatten(self, new_name: str, start: int, stop: int) -> "NamedArray":
        """Flatten contiguous dims [start, stop] into one named dim."""
        shape = self.shape
        new_shape = shape[:start] + (-1,) + shape[stop + 1 :]
        new_names = self.names[:start] + (new_name,) + self.names[stop + 1 :]
        return NamedArray(
            self.array.reshape(new_shape), new_names, self.feature_names
        )

    def unflatten(
        self, dim_name: str, sizes: Tuple[int, ...], new_names: Tuple[str, ...]
    ) -> "NamedArray":
        axis = self.dim_index(dim_name)
        shape = self.shape
        new_shape = shape[:axis] + tuple(sizes) + shape[axis + 1 :]
        names = self.names[:axis] + tuple(new_names) + self.names[axis + 1 :]
        return NamedArray(self.array.reshape(new_shape), names, self.feature_names)

    def broadcast_like(self, other: "NamedArray") -> "NamedArray":
        """Insert (size-1) missing leading/spatial dims present in `other` and
        tile to match, preserving this array's feature dim.

        Equivalent of the reference's ``unsqueeze_and_expand_from_``
        (used when joining per-timestep calendar forcings with gridded
        fields, reference: datasets/base.py:509-511).
        """
        arr = self.array
        names = list(self.names)
        xp = _xp(arr)
        for i, n in enumerate(other.names):
            if n not in names and n != "features":
                arr = xp.expand_dims(arr, i)
                names.insert(i, n)
        # broadcast non-feature dims to other's sizes
        target_shape = []
        for i, n in enumerate(names):
            if n == "features":
                target_shape.append(arr.shape[i])
            elif n in other.names:
                target_shape.append(other.dim_size(n))
            else:
                target_shape.append(arr.shape[i])
        arr = xp.broadcast_to(arr, tuple(target_shape))
        return NamedArray(arr, tuple(names), self.feature_names)

    # ------------------------------------------------------------ accessors
    def __getitem__(self, feature_name: str):
        """Select a single feature by name; keeps a size-1 features dim."""
        idx = self.feature_index(feature_name)
        axis = self.dim_index("features")
        sl = [slice(None)] * self.ndim
        sl[axis] = slice(idx, idx + 1)
        return self.array[tuple(sl)]

    def select_features(self, feature_names: Sequence[str]) -> "NamedArray":
        idxs = [self.feature_index(f) for f in feature_names]
        axis = self.dim_index("features")
        xp = _xp(self.array)
        return NamedArray(
            xp.take(self.array, xp.asarray(idxs), axis=axis),
            self.names,
            tuple(feature_names),
        )

    def iter_dim(self, dim_name: str) -> Iterable["NamedArray"]:
        for i in range(self.dim_size(dim_name)):
            yield self.select(dim_name, i)

    def __or__(self, other: "NamedArray") -> "NamedArray":
        """Concatenate along the features dim (reference: NamedTensor.__or__)."""
        return NamedArray.concat([self, other])

    # -------------------------------------------------------------- statics
    @staticmethod
    def concat(arrays: Sequence["NamedArray"]) -> "NamedArray":
        """Concatenate along the features dim; feature names are joined."""
        if not arrays:
            raise ValueError("cannot concat an empty list of NamedArrays")
        first = arrays[0]
        for a in arrays[1:]:
            if a.names != first.names:
                raise ValueError(
                    f"concat dim-name mismatch: {a.names} vs {first.names}"
                )
        axis = first.dim_index("features")
        xp = _xp(first.array)
        feature_names = tuple(f for a in arrays for f in a.feature_names)
        if len(set(feature_names)) != len(feature_names):
            raise ValueError(f"duplicate feature names in concat: {feature_names}")
        return NamedArray(
            xp.concatenate([a.array for a in arrays], axis=axis),
            first.names,
            feature_names,
        )

    @staticmethod
    def stack(arrays: Sequence["NamedArray"], dim_name: str, axis: int) -> "NamedArray":
        first = arrays[0]
        xp = _xp(first.array)
        names = first.names[:axis] + (dim_name,) + first.names[axis:]
        return NamedArray(
            xp.stack([a.array for a in arrays], axis=axis),
            names,
            first.feature_names,
        )

    @staticmethod
    def new_like(array, other: "NamedArray") -> "NamedArray":
        return NamedArray(array, other.names, other.feature_names)

    @staticmethod
    def expand_to_batch_like(array, other: "NamedArray") -> "NamedArray":
        """Wrap a batched array with other's names prefixed by `batch`."""
        return NamedArray(
            array, ("batch",) + tuple(other.names), other.feature_names
        )

    def __str__(self):
        return (
            f"NamedArray(shape={self.shape}, names={self.names}, "
            f"features={self.feature_names}, dtype={self.dtype})"
        )


def _xp(arr):
    """numpy for numpy arrays, jnp otherwise."""
    return np if isinstance(arr, np.ndarray) else jnp


def _take(arr, index: int, axis: int):
    sl = [slice(None)] * arr.ndim
    sl[axis] = index
    return arr[tuple(sl)]


def _is_tracing(arr) -> bool:
    return isinstance(arr, jax.core.Tracer)
