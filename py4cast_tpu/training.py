"""Auto-regressive training module + trainer loop.

TPU-native re-design of the reference's ``AutoRegressiveLightning`` +
Lightning ``Trainer`` (reference: py4cast/lightning.py:147-1188).
Architecture:

- ``AutoRegressiveModule`` owns the model, rollout config, loss, and the
  jit-compiled train/eval/predict steps. Steps are pure functions of
  (train-state, batch-arrays); sharding annotations on the batch put
  data parallelism in XLA's hands (gradient all-reduce over ICI comes
  from the replicated-param/sharded-batch layout — no DDP analog).
- The AR rollout is a ``lax.scan`` (py4cast_tpu.rollout), not a Python
  loop: one compiled step body regardless of ``num_pred_steps``.
- Mixed precision: bf16 activations (TPU-native), fp32 params/optimizer.
- ``Trainer`` drives epochs, validation, checkpointing (orbax + JSON
  manifest), early stopping and logging on the host.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
import weakref
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from py4cast_tpu.checkpoint import (
    CheckpointManager,
    check_format_version,
    load_manifest,
)
from py4cast_tpu.datasets.base import DatasetInfo, ItemBatch
from py4cast_tpu.losses import CombinedLoss
from py4cast_tpu.models import ModelType, build_model_from_settings, get_model_kls_and_settings
from py4cast_tpu.named_tensor import NamedArray
from py4cast_tpu.parallel.mesh import (
    is_main_process,
    make_mesh,
    MeshConfig,
    put_global,
    replicated,
    shard_batch,
    to_host,
)
from py4cast_tpu.plots import (
    PredictionEpochPlot,
    PredictionTimestepPlot,
    SpatialErrorPlot,
    StateErrorPlot,
)
from py4cast_tpu.rollout import RolloutConfig, common_features_index, rollout
from py4cast_tpu.utils import str_to_dtype


@dataclass
class TrainingSettings:
    """The `model:` config section (reference: config/CLI/model/*.yaml
    shared keys + lightning.py:152-226 hyperparameters)."""

    model_name: str = "HalfUNet"
    settings_init_args: Optional[dict] = None
    losses: List[dict] = field(
        default_factory=lambda: [
            {"class": "WeightedLoss", "weight": 1.0, "params": {"loss": "MSELoss"}}
        ]
    )
    training_strategy: str = "diff_ar"
    num_inter_steps: int = 1
    num_input_steps: int = 2
    num_pred_steps_train: int = 1
    num_pred_steps_val_test: int = 1
    mask_ratio: float = 0.0
    mask_on_nan: bool = False
    learning_rate: float = 1e-3
    min_learning_rate: float = 3e-7
    num_warmup_steps: int = 1000
    betas: Tuple[float, float] = (0.9, 0.95)
    precision: str = "32"
    accumulate_grad_batches: int = 1
    num_samples_to_plot: int = 1
    io_conf: Optional[str] = None
    seed: int = 42
    #: remat (jax.checkpoint) around the model apply, regardless of
    #: whether the model's own settings expose a checkpoint knob — the
    #: generic memory/FLOPs trade for big-batch or long-rollout runs
    use_checkpointing: bool = False
    # `channels_last` has no meaning here: NHWC is the only layout.

    def __post_init__(self):
        # YAML 1.1 parses bare scientific notation ("1e-3") as a string
        for name in ("learning_rate", "min_learning_rate", "mask_ratio"):
            setattr(self, name, float(getattr(self, name)))
        for name in ("num_inter_steps", "num_input_steps", "num_warmup_steps",
                     "accumulate_grad_batches"):
            setattr(self, name, int(getattr(self, name)))
        self.betas = tuple(float(b) for b in self.betas)


class AutoRegressiveModule:
    """Owns model, loss and the jitted step functions for one training run."""

    def __init__(
        self,
        settings: TrainingSettings,
        dataset_info: DatasetInfo,
        mesh=None,
        lat_multiple: Optional[int] = None,
    ):
        """``lat_multiple``: pad the lat dim up to a multiple of this
        (default: the mesh's spatial axis extent). Lets grids whose lat
        size does not divide the spatial mesh shard anyway — the
        motivating case is the full-resolution 1S100 grid, 1791×2801
        with 1791 = 3²·199 (reference datasets/titan/metadata.yaml:64-74
        and the minimal-divisible-domain remark, access.py:176-180).
        Padded rows are all-border: excluded from loss/metric
        denominators, border-forced in rollouts, and sliced off every
        host-facing prediction."""
        self.settings = settings
        self.dataset_info = dataset_info
        self.mesh = mesh if mesh is not None else make_mesh(MeshConfig())
        self._lat_multiple = lat_multiple
        self.compute_dtype = str_to_dtype.get(settings.precision, jnp.float32)

        statics = dataset_info.statics
        ds = settings.training_strategy == "downscaling_only"

        # --- model construction (reference: lightning.py:254-306) ---
        self.num_grid_static_features = statics.grid_statics.dim_size("features")
        self.num_input_features = (
            settings.num_input_steps * dataset_info.weather_dim * int(not ds)
            + self.num_grid_static_features
            + dataset_info.forcing_dim
            + int(settings.mask_on_nan)
        )
        self.num_output_features = dataset_info.weather_dim

        kls, model_settings = get_model_kls_and_settings(
            settings.model_name, settings.settings_init_args
        )
        self.model_settings = model_settings
        self.is_graph = kls.model_type == ModelType.GRAPH
        if self.is_graph and settings.mask_ratio > 0:
            # MAE block masking assumes a (B, lat, lon, F) grid layout
            # (rollout.mask_blocks); GRAPH models consume flattened
            # (B, ngrid, F). The reference shares the 4-D assumption
            # (lightning.py:770) — fail loudly at config time instead
            # of with an opaque unpack error at trace time.
            raise ValueError(
                f"mask_ratio={settings.mask_ratio} is unsupported for "
                f"GRAPH models ({settings.model_name}): block masking "
                "operates on the (lat, lon) grid layout. Set "
                "mask_ratio: 0."
            )

        # --- lat padding for spatial sharding (see __init__ docstring):
        # the pad is an internal device-layout detail — dataset_info,
        # manifests and every host-facing array keep the ORIGINAL grid
        from py4cast_tpu.parallel.mesh import SPATIAL_AXIS as _SP_AXIS

        _n_spatial = int(self.mesh.shape[_SP_AXIS])
        _multiple = self._lat_multiple or _n_spatial
        self._lat_pad = (
            (-statics.grid_shape[0]) % _multiple if _multiple > 1 else 0
        )
        self._orig_grid_shape = tuple(statics.grid_shape)
        if self._lat_pad:
            statics = statics.pad_lat(self._lat_pad)
            print(
                f"Padding lat {self._orig_grid_shape[0]} -> "
                f"{statics.grid_shape[0]} (all-border rows) so the grid "
                f"shards over {_multiple} spatial ways"
            )

        grid_shape = statics.grid_shape
        input_shape = (
            (grid_shape[0] * grid_shape[1],) if self.is_graph else tuple(grid_shape)
        )
        extra = {}
        if self.is_graph:
            # host-side static graph build — the analog of the reference's
            # rank_zero_setup (lightning.py:141-144, 271)
            extra["graph"] = kls.build_graph(model_settings, statics.meshgrid)
        self.model = build_model_from_settings(
            settings.model_name,
            self.num_input_features,
            self.num_output_features,
            model_settings,
            input_shape,
            **extra,
        )

        # --- static rollout inputs ---
        from py4cast_tpu.parallel.mesh import SPATIAL_AXIS, statics_sharding

        spatial_shards = int(self.mesh.shape[SPATIAL_AXIS])
        if spatial_shards > 1 and not getattr(
            self.model, "spatial_shardable", False
        ):
            raise ValueError(
                "Spatial mesh sharding requires a model whose forward "
                "tolerates a sharded lat dim; this GRAPH model runs the "
                "gather-table path (use_lattice=false or an irregular "
                "graph) — set spatial=1."
            )
        if spatial_shards > 1 and grid_shape[0] % spatial_shards:
            # unreachable with the default lat_multiple (= spatial
            # shards — padding above guarantees divisibility); a custom
            # lat_multiple that is not a multiple of the mesh axis
            # still fails loudly here
            raise ValueError(
                f"(Padded) grid lat size {grid_shape[0]} is not divisible "
                f"by the spatial mesh axis ({spatial_shards}); pass a "
                "lat_multiple that the mesh axis divides."
            )
        # the fused Pallas kernels (stencil/hop/attention) read this to
        # disable themselves under spatial sharding: a pallas_call is an
        # opaque custom call to GSPMD, so the lat-sharded paths must run
        # the plain-XLA formulas (whose pad/shift lower to halo exchanges).
        # Explicit module state, re-asserted before every trace in
        # _get_jitted — P4T_SPATIAL_SHARDS env stays as an override only
        from py4cast_tpu.ops.attention import set_spatial_shards

        self._spatial_shards = spatial_shards
        set_spatial_shards(spatial_shards)
        if self.is_graph:
            # flattened (ngrid, …) statics: row-major flatten means a
            # contiguous shard of ngrid IS a band of lat rows, so the
            # same lat-sharding story applies to lattice GNNs
            statics = statics.flatten_spatial()
        gs = np.asarray(statics.grid_statics.array, np.float32)
        bm = np.asarray(statics.border_mask, np.float32)
        # host-facing interior mask stays UNPADDED: score cards/plotters
        # consume the sliced-back eval arrays (named_eval_arrays), while
        # the jitted loss threads the padded mask via step_buffers —
        # identical interior count either way (pad rows are all border)
        host_statics = (
            dataset_info.statics.flatten_spatial()
            if self.is_graph else dataset_info.statics
        )
        self.interior_mask_np = np.asarray(
            host_statics.interior_mask, np.float32
        )
        pad_interior_np = np.asarray(statics.interior_mask, np.float32)
        # grid-sized device buffers are THREADED THROUGH the jitted steps
        # as arguments, never closed over: a closed-over jax.Array is
        # baked into the HLO as a literal constant, bloating every train
        # program by the full statics/mask payload (tens of MB of
        # serialized program — slow compiles, giant compile-cache
        # entries, and remote-compile size limits)
        self._buffers = {
            "grid_statics": put_global(
                gs, statics_sharding(self.mesh, gs.ndim)
            ),
            "border_mask": put_global(
                bm, statics_sharding(self.mesh, bm.ndim)
            ),
            "interior_mask": put_global(
                pad_interior_np,
                statics_sharding(self.mesh, pad_interior_np.ndim),
            ),
        }
        # batches are (B, T, lat, lon, F) for grid models and
        # (B, T, ngrid, F) for GRAPH; either way axis 2 is the one the
        # spatial mesh axis shards (contiguous ngrid shards = lat bands;
        # batch_sharding ignores the axis when the mesh has spatial=1)
        self._batch_lat_axis = 2

        out_names = tuple(dataset_info.output_feature_names)
        forcing_names = tuple(dataset_info.forcing_feature_names)
        self.output_feature_names = out_names
        self.forcing_feature_names = forcing_names
        # small (F,) vectors ride in the same buffers pytree for symmetry
        self._buffers["step_diff_mean"] = jnp.asarray(
            dataset_info.diff_stats.to_array("mean", out_names)
        )
        self._buffers["step_diff_std"] = jnp.asarray(
            dataset_info.diff_stats.to_array("std", out_names)
        )
        self._buffers["stats_mean"] = jnp.asarray(
            dataset_info.stats.to_array("mean", out_names)
        )
        self._buffers["stats_std"] = jnp.asarray(
            dataset_info.stats.to_array("std", out_names)
        )

        # active dropout / stochastic depth? (reference settings surface:
        # swinunetr.yaml drop rates, unetrpp.yaml dropout_rate) — when any
        # rate is nonzero, train-time rollouts pass a per-step rng and
        # apply the model with deterministic=False. The field list is
        # DECLARED by each settings class (DROPOUT_FIELDS) rather than
        # probed by name here, so a new model exposing dropout under a
        # different name can't silently train deterministically: any
        # nonzero *drop*-named field NOT declared is rejected at build.
        declared = tuple(
            getattr(type(self.model_settings), "DROPOUT_FIELDS", ())
        )
        self._dropout_active = any(
            float(getattr(self.model_settings, f) or 0.0) > 0.0
            for f in declared
        )
        if dataclasses.is_dataclass(self.model_settings):
            undeclared = [
                f.name for f in dataclasses.fields(self.model_settings)
                if "drop" in f.name and f.name not in declared
                and float(getattr(self.model_settings, f.name) or 0.0) > 0.0
            ]
            if undeclared:
                raise ValueError(
                    f"{type(self.model_settings).__name__} has nonzero "
                    f"dropout-like fields {undeclared} not listed in its "
                    "DROPOUT_FIELDS — declare them so train-time rollouts "
                    "thread an rng (otherwise the rate would be a silent "
                    "no-op)."
                )

        self.rollout_cfg = RolloutConfig(
            strategy=settings.training_strategy,
            num_inter_steps=settings.num_inter_steps,
            num_input_steps=settings.num_input_steps,
            mask_on_nan=settings.mask_on_nan,
            mask_ratio=settings.mask_ratio,
            common_features_idx=common_features_index(
                out_names, forcing_names,
                strict=settings.training_strategy == "downscaling_only",
            ),
        )

        # --- loss (reference: lightning.py:305-306) ---
        self.loss = CombinedLoss(settings.losses)
        self.loss.prepare(self.interior_mask_np, dataset_info, out_names)

        self._jit_cache: Dict[Any, Callable] = {}
        # (weakref(batch), device outputs) from the latest eval_step —
        # lets named_eval_arrays skip re-uploading the target batch
        self._eval_outputs_cache = None
        self._graph_buffers: dict = {}

    # ------------------------------------------------------------------ setup
    def init_params(self, rng: jax.Array):
        """Initialize trainable params.

        GRAPH models are initialized against a TINY surrogate graph:
        param shapes depend only on feature dims, so this avoids
        compiling the full-size forward (minutes for million-edge
        graphs) just to draw initial weights. The real graph arrays are
        staged on device once and threaded through the jitted steps as
        arguments — never baked into HLO as literal constants."""
        if self.is_graph:
            kls = type(self.model)
            tiny_mesh = np.stack(
                np.meshgrid(np.linspace(0, 1, 16), np.linspace(0, 1, 16),
                            indexing="ij")
            )
            tiny_graph = kls.build_graph(self.model_settings, tiny_mesh)
            tiny_model = kls(
                num_input_features=self.num_input_features,
                num_output_features=self.num_output_features,
                input_shape=(256,),
                settings=self.model_settings,
                graph=tiny_graph,
            )
            x = jnp.zeros((1, 256, self.num_input_features), jnp.float32)
            # init on CPU when available: drawing initial weights doesn't
            # need the accelerator, and XLA-CPU compiles the throwaway
            # init program much faster than a TPU round-trip
            try:
                # LOCAL device: under multi-host, jax.devices()[0] may
                # belong to another process (not addressable here)
                cpu = jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                cpu = None
            if cpu is not None:
                with jax.default_device(cpu):
                    variables = jax.jit(tiny_model.init)(rng, x)
            else:
                variables = jax.jit(tiny_model.init)(rng, x)
            rep = replicated(self.mesh)
            self._graph_buffers = {
                k: put_global(np.asarray(v), rep)
                for k, v in kls.graph_arrays(self.model.graph).items()
            }
            return variables
        spatial = self.model.input_shape
        x = jnp.zeros((1,) + spatial + (self.num_input_features,), jnp.float32)
        self._graph_buffers = {}
        # Init is JITTED so XLA dead-code-eliminates the full-resolution
        # forward pass (param values depend only on the rng). Device
        # choice, both measured on UNetRPP hidden-1024 @ 512×640:
        # - single process with an accelerator: init ON the accelerator
        #   (26 s cold incl. compile, seconds warm via the persistent
        #   compile cache; params then stay on device — init_state
        #   reshards device-to-device, no host round trip);
        # - multi-host (or CPU-only): init on XLA-CPU — every process
        #   must hold identical host params to feed its addressable
        #   shards (put_global), and a remote-device download of the
        #   full payload per host would cost more than the CPU compile.
        # (Round-3 history: EAGER init executed the full forward op by
        # op — 136 s on CPU; the CPU *jit compile* of this model is
        # also ~130 s on a 1-core host, which is why single-process
        # prefers the accelerator.)
        if jax.process_count() == 1 and jax.default_backend() != "cpu":
            variables = jax.jit(self.model.init)(rng, x)
        else:
            try:
                cpu = jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                cpu = None
            if cpu is not None:
                try:
                    with jax.default_device(cpu):
                        variables = jax.jit(self.model.init)(rng, x)
                except Exception:
                    # a device-specific lowering path refused the CPU —
                    # fall back to initializing on the default backend
                    variables = jax.jit(self.model.init)(rng, x)
            else:
                variables = jax.jit(self.model.init)(rng, x)
        if hasattr(self.model, "load_pretrained"):
            # pretrained encoder injection (reference: encoder_weights,
            # config/CLI/model/customunet.yaml)
            variables = self.model.load_pretrained(variables)
        return variables

    def make_optimizer(self, num_training_steps: int) -> optax.GradientTransformation:
        """AdamW + warmup-cosine-with-min-lr (reference: lightning.py:442-467).

        ``num_training_steps`` counts MICRO-batches; optax.MultiSteps
        advances the inner schedule once per ``accumulate_grad_batches``
        micro-batches, so the schedule is built in OPTIMIZER steps —
        Lightning's ``estimated_stepping_batches`` semantics."""
        s = self.settings
        k = max(1, s.accumulate_grad_batches)
        num_opt_steps = -(-num_training_steps // k)  # ceil division
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=s.learning_rate,
            warmup_steps=s.num_warmup_steps,
            decay_steps=max(num_opt_steps, s.num_warmup_steps + 1),
            end_value=s.min_learning_rate,
        )
        self._schedule = schedule
        tx = optax.adamw(schedule, b1=s.betas[0], b2=s.betas[1])
        if k > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=k)
        return tx

    def init_state(self, rng: jax.Array, num_training_steps: int) -> TrainState:
        """Params upload ONCE (they were drawn on CPU); the optimizer
        state (Adam m/v — 2x the param payload) is created ON DEVICE by
        a tiny jitted program instead of being transferred."""
        params = self.init_params(rng)
        tx = self.make_optimizer(num_training_steps)
        rep = replicated(self.mesh)
        params = jax.tree.map(
            # device-resident leaves (single-process accelerator init)
            # reshard device-to-device; host leaves upload once. Going
            # through np.asarray unconditionally would DOWNLOAD the
            # full payload through the (possibly remote) device link
            # just to re-upload it.
            lambda x: (
                jax.device_put(x, rep)
                if isinstance(x, jax.Array) and jax.process_count() == 1
                else put_global(np.asarray(x), rep)
            ) if hasattr(x, "shape") else x,
            params,
        )

        def create(p):
            return TrainState.create(
                apply_fn=self.model.apply, params=p, tx=tx
            )

        return jax.jit(create, out_shardings=rep)(params)

    def num_params(self, state: TrainState) -> int:
        return sum(int(p.size) for p in jax.tree.leaves(state.params))

    def summarize(self, state: TrainState) -> str:
        """Per-submodule parameter table (the torchinfo.summary analog
        printed at fit start, reference: lightning.py:406)."""
        groups: Dict[str, int] = {}
        flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
        for path, leaf in flat:
            keys = [getattr(k, "key", str(k)) for k in path]
            top = keys[1] if len(keys) > 1 else keys[0]
            groups[top] = groups.get(top, 0) + int(leaf.size)
        width = max((len(k) for k in groups), default=10) + 2
        lines = [f"{'module':<{width}}params"]
        for k, v in sorted(groups.items(), key=lambda kv: -kv[1]):
            lines.append(f"{k:<{width}}{v:,}")
        lines.append(f"{'TOTAL':<{width}}{self.num_params(state):,}")
        return "\n".join(lines)

    # ----------------------------------------------------------------- pieces
    def _model_apply(self, params, graph=None, train=False):
        """Features-last model application with bf16 activation policy.

        Honors the model's ``use_checkpointing`` setting with jax
        rematerialization — the TPU analog of the reference GNNs'
        activation checkpointing / CPU offload flags
        (config/CLI/model/graphlam.yaml:20-21). With ``train=True`` and
        active dropout rates, the returned callable takes a second rng
        argument and applies the model with deterministic=False."""

        def cast_floats(tree):
            return jax.tree.map(
                lambda p: p.astype(self.compute_dtype)
                if jnp.issubdtype(p.dtype, jnp.floating)
                else p,
                tree,
            )

        dropout = train and self._dropout_active

        def apply(x, rng=None):
            p = params
            if self.compute_dtype != jnp.float32:
                # true mixed precision: bf16 params INSIDE apply (master
                # copies stay fp32 in the optimizer) — otherwise flax's
                # dtype promotion silently upcasts activations back to
                # fp32 at the first Dense/Conv
                x = x.astype(self.compute_dtype)
                p = cast_floats(p)
            kwargs = {}
            if graph:
                kwargs["graph_arrays"] = graph
            if dropout:
                kwargs["deterministic"] = False
                kwargs["rngs"] = {"dropout": rng}
            y = self.model.apply(p, x, **kwargs)
            return y.astype(jnp.float32)

        if (
            self.settings.use_checkpointing
            or getattr(self.model_settings, "use_checkpointing", False)
            or getattr(self.model_settings, "use_checkpoint", False)
        ):
            apply = jax.checkpoint(apply)
        return apply

    def _flatten_graph(self, arr: Optional[jnp.ndarray]):
        """(B, T, lat, lon, F) → (B, T, ngrid, F) for GRAPH models."""
        if arr is None or not self.is_graph:
            return arr
        b, t = arr.shape[:2]
        return arr.reshape(b, t, -1, arr.shape[-1])

    def step_buffers(self) -> dict:
        """The device-resident constants every jitted step takes as an
        ARGUMENT (statics, masks, stats vectors, graph arrays). Passing
        them per call is free (already-committed device arrays); closing
        over them would bake each one into the compiled program as a
        literal constant."""
        return {**self._buffers, "graph": self._graph_buffers}

    def _rollout(self, params, inputs, forcing, outputs, num_pred_steps, rng,
                 buffers, train=False):
        cfg = self.rollout_cfg
        if train and self._dropout_active:
            cfg = dataclasses.replace(cfg, model_rng=True)
        return rollout(
            self._model_apply(params, buffers.get("graph"), train=train),
            inputs,
            forcing,
            outputs,
            buffers["grid_statics"],
            buffers["border_mask"],
            buffers["step_diff_mean"],
            buffers["step_diff_std"],
            cfg,
            num_pred_steps,
            rng,
        )

    def _mask_and_target(self, outputs):
        """NaN mask + zero-filled target (reference: lightning.py:786-797)."""
        if self.settings.mask_on_nan:
            mask = (~jnp.isnan(outputs)).astype(jnp.float32)
            return mask, jnp.nan_to_num(outputs, nan=0.0)
        return jnp.ones_like(outputs), outputs

    def _named(self, arr) -> NamedArray:
        spatial = ("ngrid",) if self.is_graph else ("lat", "lon")
        return NamedArray(
            arr,
            ("batch", "timestep") + spatial + ("features",),
            self.output_feature_names,
        )

    def _batch_loss(self, params, inputs, forcing, outputs, num_pred_steps, rng,
                    buffers, train=False):
        preds = self._rollout(
            params, inputs, forcing, outputs, num_pred_steps, rng, buffers,
            train=train,
        )
        mask, target = self._mask_and_target(outputs)
        per_step = self.loss(
            self._named(preds), self._named(target), mask,
            interior_mask=buffers["interior_mask"],
        )
        return jnp.mean(per_step), (preds, per_step)

    # ------------------------------------------------------------------ steps
    def _get_jitted(self, kind: str, num_pred_steps: int):
        # (re)assert THIS module's spatial-shard gate on EVERY step call,
        # not just wrapper creation: the Pallas kernel gates consult
        # module-level state at trace time, and jax.jit RETRACES a cached
        # wrapper whenever input shapes change — so a second module with
        # a different mesh constructed in between would otherwise leak
        # its gate value into our retrace (ADVICE r3; r4 review)
        from py4cast_tpu.ops.attention import set_spatial_shards

        set_spatial_shards(self._spatial_shards)
        key = (kind, num_pred_steps)
        if key in self._jit_cache:
            return self._jit_cache[key]

        if kind == "train":

            def step(state: TrainState, inputs, forcing, outputs, rng,
                     buffers):
                grad_fn = jax.value_and_grad(self._batch_loss, has_aux=True)
                (loss, _), grads = grad_fn(
                    state.params, inputs, forcing, outputs, num_pred_steps, rng,
                    buffers, train=True,
                )
                return state.apply_gradients(grads=grads), loss

            fn = jax.jit(step, donate_argnums=(0,))
        elif kind == "eval":

            def step(state: TrainState, inputs, forcing, outputs, rng,
                     buffers):
                _, (preds, per_step) = self._batch_loss(
                    state.params, inputs, forcing, outputs, num_pred_steps, rng,
                    buffers,
                )
                # (B, T) PER-SAMPLE per-timestep loss: the host masks out
                # padded tail rows (ItemBatch.valid_count) before
                # averaging, so eval statistics cover every real sample
                return preds, per_step

            fn = jax.jit(step)
        elif kind == "predict":

            def step(state: TrainState, inputs, forcing, rng, buffers):
                preds = self._rollout(
                    state.params, inputs, forcing, None, num_pred_steps, rng,
                    buffers,
                )
                # de-normalize (reference: lightning.py:1164-1169)
                return preds * buffers["stats_std"] + buffers["stats_mean"]

            fn = jax.jit(step)
        else:
            raise ValueError(kind)
        self._jit_cache[key] = fn
        return fn

    def batch_arg_dtypes(self):
        """Host dtypes for the (inputs, forcing, outputs) step arguments.

        Model food (inputs, forcing) rides bf16 when compute is bf16:
        the 21-feature batch tensors are the program's biggest arguments
        and the TPU's (8, 128) lane tiling stores them padded 6.1x, so
        halving the element size halves real HBM footprint, DMA traffic
        and host→device transfer. Targets stay fp32 (loss accumulation
        fidelity) and rollout() upcasts the AR carry back to fp32.
        Downscaling is the exception: the forcing carries the coarse
        BASE STATE that predictions add to, so it keeps fp32 too.
        """
        import ml_dtypes

        bf16_food = (
            self.compute_dtype == jnp.bfloat16
            and self.settings.training_strategy != "downscaling_only"
        )
        food = ml_dtypes.bfloat16 if bf16_food else np.float32
        return food, food, np.float32

    def _pad_lat_np(self, a: Optional[np.ndarray]) -> Optional[np.ndarray]:
        """Zero-pad the lat axis (2) of a host (B, T, lat, lon, F) batch
        array up to the padded grid — pad rows are all-border, so they
        never reach the loss (see __init__)."""
        if a is None or not self._lat_pad:
            return a
        widths = [(0, 0)] * a.ndim
        widths[2] = (0, self._lat_pad)
        return np.pad(a, widths)

    def _unpad(self, arr):
        """Slice padded lat rows off a device prediction — every
        host-facing array (predict output, eval arrays for plotters and
        metrics) carries the ORIGINAL grid."""
        if not self._lat_pad:
            return arr
        if self.is_graph:
            # row-major flatten with lat major: the first lat*lon
            # entries of ngrid are exactly the real rows
            real = self._orig_grid_shape[0] * self._orig_grid_shape[1]
            return arr[:, :, :real]
        return arr[:, :, : self._orig_grid_shape[0]]

    def _batch_arrays(self, batch: ItemBatch, with_outputs: bool = True):
        in_dt, fo_dt, out_dt = self.batch_arg_dtypes()
        inputs = self._flatten_graph(
            jnp.asarray(self._pad_lat_np(
                np.asarray(batch.inputs.array, np.float32)
            ).astype(in_dt))
            if batch.inputs is not None
            else None
        )
        forcing = self._flatten_graph(
            jnp.asarray(self._pad_lat_np(
                np.asarray(batch.forcing.array, np.float32)
            ).astype(fo_dt))
        )
        outputs = (
            self._flatten_graph(
                jnp.asarray(self._pad_lat_np(
                    np.asarray(batch.outputs.array, np.float32)
                ).astype(out_dt))
            )
            if with_outputs
            else None
        )
        if inputs is None:
            # downscaling-only datasets may have no prognostic inputs:
            # the window is a zero placeholder with output feature width
            b = forcing.shape[0]
            spatial = forcing.shape[2:-1]
            inputs = jnp.zeros(
                (b, self.settings.num_input_steps) + spatial
                + (self.num_output_features,),
                jnp.float32,
            )
        if with_outputs:
            return shard_batch(
                self.mesh, inputs, forcing, outputs, lat_axis=self._batch_lat_axis
            )
        inputs, forcing = shard_batch(
            self.mesh, inputs, forcing, lat_axis=self._batch_lat_axis
        )
        return inputs, forcing, None

    def train_step(self, state, batch: ItemBatch, rng):
        inputs, forcing, outputs = self._batch_arrays(batch)
        fn = self._get_jitted("train", batch.num_pred_steps)
        return fn(state, inputs, forcing, outputs, rng, self.step_buffers())

    def eval_step(self, state, batch: ItemBatch, rng):
        inputs, forcing, outputs = self._batch_arrays(batch)
        # keep THIS batch's device-resident targets alive so
        # named_eval_arrays can reuse them instead of re-uploading the
        # host batch (measured: the re-upload was over half the
        # eval-path host tax at the 512x640 bench grid —
        # doc/performance.md round-5). weakref identity guards against
        # id() reuse on a freed batch object. Single-process only: the
        # multi-host path always re-gathers, so pinning the sharded
        # targets there would hold HBM for nothing.
        if jax.process_count() == 1:
            self._eval_outputs_cache = (weakref.ref(batch), outputs)
        fn = self._get_jitted("eval", batch.num_pred_steps)
        return fn(state, inputs, forcing, outputs, rng, self.step_buffers())

    def predict_step(self, state, batch: ItemBatch, rng):
        self.check_feature_contract(batch)
        inputs, forcing, _ = self._batch_arrays(batch, with_outputs=False)
        fn = self._get_jitted("predict", batch.num_pred_steps)
        preds = fn(state, inputs, forcing, rng, self.step_buffers())
        return self._named(self._unpad(preds))

    def check_feature_contract(self, batch: ItemBatch):
        """Inference-time contract check: the batch's feature names must
        match what the module was built for (reference: lightning.py:1123-1128,
        against names stored in the checkpoint at :338-354)."""
        batch_out = tuple(batch.outputs.feature_names) if batch.outputs else ()
        if batch_out and batch_out != self.output_feature_names:
            raise ValueError(
                f"Feature-name contract mismatch: model was trained on "
                f"{self.output_feature_names}, batch provides {batch_out}"
            )

    def load_raw_params(self, state, params_path):
        """Escape hatch: inject raw params from any orbax tree into the
        current state, ignoring optimizer state — the analog of the
        reference's use_old_weights (lightning.py:1105-1116)."""
        import orbax.checkpoint as ocp
        from pathlib import Path as _P

        restored = ocp.StandardCheckpointer().restore(
            _P(params_path).absolute(), target=state
        )
        return state.replace(params=restored.params)

    # ----------------------------------------------------------- aux wiring
    def _eval_arrays_fused(self, preds, outputs):
        """One jitted program for the eval-array plumbing: unpad the
        padded-lat predictions AND the device-resident targets, then
        NaN-mask/zero-fill — replacing a host download + re-upload of
        the full target batch plus several eager dispatches (each a
        round-trip on a tunneled device). Retraces only when batch
        shape changes (the padded last batch)."""
        key = ("eval_arrays",)
        fn = self._jit_cache.get(key)
        if fn is None:

            def arrays(preds, outputs):
                outputs = self._unpad(outputs)
                mask, target = self._mask_and_target(outputs)
                return self._unpad(preds), target, mask

            fn = jax.jit(arrays)
            self._jit_cache[key] = fn
        return fn(preds, outputs)

    def named_eval_arrays(self, preds, batch: ItemBatch):
        """(pred, target, mask) for plotters/metrics, as NamedArrays +
        float mask (reference: get_mask_on_nan, lightning.py:786-797).

        Padded tail rows (``batch.valid_count`` < batch size) are sliced
        off so plotters and metric accumulators only see real samples.

        Under multi-host this is a COLLECTIVE (must run on every
        process): predictions are a global sharded array and the batch
        holds only this process's contiguous row slice, so both are
        allgathered to every host — callers then plot/accumulate on
        process 0 only (reference rank-zero gating: plots.py:285,539,621).
        """
        if jax.process_count() == 1:
            cached = self._eval_outputs_cache
            if cached is not None and cached[0]() is batch:
                # fast path: targets are already on device (uploaded by
                # eval_step for the loss) — unpad + mask + target run as
                # ONE jitted program, no host round-trip of the batch.
                # Assumes the batch was not mutated since eval_step (the
                # identity check can't see content changes); consumed
                # once so the device targets don't outlive the batch.
                self._eval_outputs_cache = None
                pred_u, target, mask = self._eval_arrays_fused(
                    preds, cached[1]
                )
                nv = batch.valid_count
                return (
                    self._named(pred_u[:nv]),
                    self._named(target[:nv]),
                    mask[:nv],
                )
        preds = self._unpad(preds)  # plotters/metrics see the real grid
        outputs_np = np.asarray(batch.outputs.array, np.float32)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            preds = jnp.asarray(to_host(preds))
            # loader slices the global batch contiguously by process
            # index (datasets/loader.py), so tiled process order IS
            # global row order
            outputs_np = multihost_utils.process_allgather(
                outputs_np, tiled=True
            )
        outputs = self._flatten_graph(jnp.asarray(outputs_np))
        mask, target = self._mask_and_target(outputs)
        # num_valid counts real rows in the GLOBAL batch (loader.py);
        # when unset, every gathered row is real — batch.valid_count
        # would undercount here (it falls back to the LOCAL batch size)
        nv = batch.num_valid if batch.num_valid else outputs_np.shape[0]
        return (
            self._named(preds[:nv]),
            self._named(target[:nv]),
            mask[:nv],
        )

    def make_scaled_loss(self, kind: str):
        """Prepared ScaledLoss for plotters/score cards
        (reference: lightning.py:869-886, 995-1015)."""
        from py4cast_tpu.losses import ScaledLoss

        loss = ScaledLoss("MSELoss" if kind == "rmse" else "L1Loss")
        loss.prepare(
            self.interior_mask_np, self.dataset_info, self.output_feature_names
        )
        return loss

    def make_metrics(self, save_path, num_pred_steps: int):
        """The PSD/ACC metric set updated during validation/test
        (reference: lightning.py:311-325)."""
        from py4cast_tpu.metrics import MetricACC, MetricPSDK, MetricPSDVar

        grid_shape = self.dataset_info.statics.grid_shape
        # PSD metrics score the LAST prediction step, like the reference
        # (lightning.py:316-318: pred_step = num_pred_steps_val_test - 1)
        last_step = max(0, num_pred_steps - 1)
        return {
            "psd_k": MetricPSDK(
                save_path, self.output_feature_names, grid_shape,
                pred_step=last_step,
            ),
            "psd_var": MetricPSDVar(
                self.output_feature_names, grid_shape, pred_step=last_step
            ),
            "acc": MetricACC(self.dataset_info, num_pred_steps),
        }

    # --------------------------------------------------------------- manifest
    def manifest(self) -> dict:
        """Self-describing artifact metadata (reference: lightning.py:338-354)."""
        spatial = ("ngrid",) if self.is_graph else ("lat", "lon")
        from py4cast_tpu.checkpoint import CHECKPOINT_FORMAT_VERSION

        return {
            "framework": "py4cast_tpu",
            # param-semantics version; restores gate on it loudly
            # (checkpoint.check_format_version)
            "checkpoint_format": CHECKPOINT_FORMAT_VERSION,
            "model_name": self.settings.model_name,
            "model_settings": self.model_settings,
            "training_settings": dataclasses.asdict(self.settings),
            "dataset": self.dataset_info.name,
            "input_feature_names": list(self.output_feature_names),
            "output_feature_names": list(self.output_feature_names),
            "forcing_feature_names": list(self.forcing_feature_names),
            "output_dim_names": ["batch", "timestep", *spatial, "features"],
            "output_dtype": "float32",
            "stats": {
                n: self.dataset_info.stats[n] for n in self.output_feature_names
            },
            "diff_stats": {
                n: self.dataset_info.diff_stats[n]
                for n in self.output_feature_names
                if n in self.dataset_info.diff_stats
            },
            "grid_shape": list(self.dataset_info.statics.grid_shape),
            "units": self.dataset_info.units_by_feature,
        }


def check_manifest_contract(manifest: dict, dataset_info: DatasetInfo):
    """Validate a dataset against a trained artifact's stored contract.

    The reference stores feature names in the checkpoint
    (lightning.py:338-354) and checks them at predict (:1123-1128); here
    the manifest additionally pins normalization stats and grid shape,
    so a train/predict drift in ANY of them errors loudly instead of
    silently mis-normalizing predictions.
    """
    check_format_version(manifest)
    problems = []
    out_names = list(dataset_info.output_feature_names)
    if out_names != list(manifest["output_feature_names"]):
        problems.append(
            f"output features differ: trained on "
            f"{manifest['output_feature_names']}, dataset provides {out_names}"
        )
    forcing = list(dataset_info.forcing_feature_names)
    if forcing != list(manifest.get("forcing_feature_names", forcing)):
        problems.append(
            f"forcing features differ: trained on "
            f"{manifest['forcing_feature_names']}, dataset provides {forcing}"
        )
    grid = list(dataset_info.statics.grid_shape)
    if grid != list(manifest.get("grid_shape", grid)):
        problems.append(
            f"grid shape differs: trained on {manifest['grid_shape']}, "
            f"dataset provides {grid}"
        )
    drifted = []
    for name, stored in manifest.get("stats", {}).items():
        if name not in out_names:
            continue
        current = dataset_info.stats[name]
        for key in ("mean", "std"):
            if key in stored and not np.isclose(
                float(stored[key]), float(current[key]), rtol=1e-5, atol=1e-8
            ):
                drifted.append(
                    f"{name}.{key}: ckpt {float(stored[key]):.6g} vs "
                    f"dataset {float(current[key]):.6g}"
                )
    if drifted:
        problems.append("normalization stats drifted: " + "; ".join(drifted))
    if problems:
        raise ValueError(
            "Checkpoint/dataset contract mismatch — the restored model "
            "was trained under a different data contract:\n- "
            + "\n- ".join(problems)
        )


@dataclass
class TrainerConfig:
    """The `trainer:` config section (reference: config/CLI/trainer.yaml)."""

    max_epochs: int = 1
    batch_size: int = 1
    num_workers: int = 2
    prefetch_factor: int = 2
    limit_train_batches: Optional[int] = None
    limit_val_batches: Optional[int] = None
    check_val_every_n_epoch: int = 1
    logging_enabled: bool = True
    plot_period: int = 1  # epochs between plotter updates (reference PLOT_PERIOD)
    num_samples_to_plot: int = 1
    # device mesh layout: data_parallel × spatial (-1 = all remaining)
    mesh_data_parallel: int = -1
    mesh_spatial: int = 1
    early_stopping_patience: int = 50
    save_path: str = "runs/default"
    log_every_n_steps: int = 10
    profiler: Optional[str] = None  # None | "simple" | "jax"
    fast_dev_run: bool = False
    seed: int = 42


class Trainer:
    """Host-side epoch loop: fit / test / predict.

    Mirrors the Lightning Trainer surface the reference uses
    (fit → train+val+ckpt, test → scoring, predict → product export).
    """

    def __init__(self, config: TrainerConfig, loggers=None):
        self.config = config
        self.save_path = Path(config.save_path)
        # host-0 gating (reference rank-zero guards, lightning.py:141-144,
        # plots.py:285,539,621): every process computes, only process 0
        # writes checkpoints/logs/figures/scores
        self.is_main = is_main_process()
        if self.is_main:
            self.save_path.mkdir(parents=True, exist_ok=True)
        self.loggers = (loggers if loggers is not None else []) if self.is_main else []
        from py4cast_tpu.settings import enable_compilation_cache

        enable_compilation_cache()  # warm restarts skip the big compiles

    def _log(self, tag: str, value: float, step: int):
        if not self.is_main:
            return
        for lg in self.loggers:
            lg.log_scalar(tag, value, step)

    @staticmethod
    def _host_state(state):
        """Checkpoint-ready host copy of a (possibly multi-host
        replicated) train state: with >1 process, orbax writes happen on
        process 0 only, so leaves are materialized host-side first
        (params are replicated — every host has the full value)."""
        if jax.process_count() == 1:
            return state
        return jax.tree.map(
            lambda x: to_host(x) if hasattr(x, "shape") else x, state
        )

    def fit(
        self,
        module: AutoRegressiveModule,
        train_ds,
        val_ds,
        ckpt_path: Optional[str] = None,
    ):
        cfg = self.config
        rng = jax.random.key(module.settings.seed)

        train_loader = train_ds.loader(
            batch_size=cfg.batch_size,
            num_workers=cfg.num_workers,
            shuffle=True,
            prefetch=cfg.prefetch_factor,
            seed=cfg.seed,
        )
        # score EVERY val sample: pad the tail batch instead of dropping
        # it (the eval loop below masks padded rows via ``num_valid``) —
        # val_mean_loss drives checkpoint selection AND early stopping,
        # so silently ignoring up to batch_size-1 tail samples would bias
        # both (reference: torch val DataLoader drop_last=False,
        # /root/reference/py4cast/datasets/base.py:735-743)
        val_loader = val_ds.loader(
            batch_size=cfg.batch_size, num_workers=cfg.num_workers,
            drop_last=False, pad_last=True,
        )
        steps_per_epoch = len(train_loader)
        if cfg.limit_train_batches:
            steps_per_epoch = min(steps_per_epoch, cfg.limit_train_batches)
        max_epochs = 1 if cfg.fast_dev_run else cfg.max_epochs
        num_training_steps = max(1, steps_per_epoch * max_epochs)

        state = module.init_state(rng, num_training_steps)
        ckpt = CheckpointManager(
            self.save_path / "checkpoints",
            module.manifest() if self.is_main else None,
        )
        if ckpt_path:
            # param-semantics gate BEFORE restore: a format-1 SwinUNetR/
            # UNetRPP tree could partially alias the current one and
            # compute silently-different outputs (checkpoint.py history)
            try:
                old_manifest = load_manifest(Path(ckpt_path))
            except FileNotFoundError:
                old_manifest = None  # raw orbax tree; nothing to check
            if old_manifest is not None:
                check_format_version(old_manifest)
            state = ckpt.restore(ckpt_path, state)
            print(f"Resumed from checkpoint {ckpt_path}")

        if self.is_main:
            print(
                f"Model: {module.settings.model_name} | params: "
                f"{module.num_params(state)/1e6:.2f}M | strategy: "
                f"{module.settings.training_strategy} | devices: "
                f"{module.mesh.devices.size}"
            )
            print(module.summarize(state))
            self._dump_run_info(module)
        profile_dir = None
        if cfg.profiler == "jax":
            profile_dir = self.save_path / "profile"
            jax.profiler.start_trace(str(profile_dir))

        global_step = 0
        epochs_no_improve = 0
        for epoch in range(max_epochs):
            # ------------------------------ train
            t0 = time.perf_counter()
            losses = []
            for i, batch in enumerate(train_loader):
                if cfg.limit_train_batches and i >= cfg.limit_train_batches:
                    break
                if cfg.fast_dev_run and i >= 1:
                    break
                rng, step_rng = jax.random.split(rng)
                state, loss = module.train_step(state, batch, step_rng)
                losses.append(loss)
                global_step += 1
                if global_step % cfg.log_every_n_steps == 0:
                    self._log("train/loss", float(loss), global_step)
                    # LR monitor (reference: trainer.yaml:46-48); the
                    # schedule ticks in optimizer steps, not micro-steps
                    if hasattr(module, "_schedule"):
                        opt_step = global_step // max(
                            1, module.settings.accumulate_grad_batches
                        )
                        self._log(
                            "lr-AdamW", float(module._schedule(opt_step)),
                            global_step,
                        )
            train_loss = float(np.mean([float(l) for l in losses])) if losses else float("nan")
            dt_train = time.perf_counter() - t0
            sps = len(losses) * cfg.batch_size / max(dt_train, 1e-9)
            self._log("mean_loss_epoch/train", train_loss, global_step)
            self._log("train/samples_per_sec", sps, global_step)

            # ------------------------------ validate
            val_loss = float("nan")
            if (epoch + 1) % cfg.check_val_every_n_epoch == 0 or cfg.fast_dev_run:
                module._plot_loggers = self.loggers
                module.current_epoch = epoch
                do_plots = (
                    cfg.logging_enabled
                    and not cfg.fast_dev_run
                    and epoch % cfg.plot_period == 0
                )
                # multi-host: every process joins the allgather in
                # named_eval_arrays below, but only process 0 builds
                # plotters/metrics and writes figures/scores (reference
                # rank-zero gating: plots.py:285,539,621)
                plotters, metrics, metric_states = [], {}, {}
                if do_plots and self.is_main:
                    # (reference: on_validation_start, lightning.py:864-886)
                    plotters = [
                        StateErrorPlot(
                            {"mae": module.make_scaled_loss("mae")},
                            prefix="Validation",
                            save_path=self.save_path,
                        ),
                        PredictionTimestepPlot(
                            num_samples_to_plot=cfg.num_samples_to_plot,
                            num_features_to_plot=4,
                            prefix="Validation",
                            save_path=self.save_path,
                        ),
                        PredictionEpochPlot(
                            num_samples_to_plot=cfg.num_samples_to_plot,
                            num_features_to_plot=4,
                            prefix="Validation",
                            save_path=self.save_path,
                        ),
                    ]
                    metrics = module.make_metrics(
                        self.save_path, module.settings.num_pred_steps_val_test
                    )
                    metric_states = {k: m.init_state() for k, m in metrics.items()}
                vrows = []  # per-SAMPLE (valid_count, T) loss rows
                for i, batch in enumerate(val_loader):
                    if cfg.limit_val_batches and i >= cfg.limit_val_batches:
                        break
                    if cfg.fast_dev_run and i >= 1:
                        break
                    rng, step_rng = jax.random.split(rng)
                    preds, per_step = module.eval_step(state, batch, step_rng)
                    rows = to_host(per_step)  # GLOBAL (B, T) rows
                    nv = batch.num_valid if batch.num_valid else rows.shape[0]
                    vrows.append(rows[:nv])
                    if do_plots:
                        pred_na, target_na, mask = module.named_eval_arrays(
                            preds, batch
                        )
                        for p in plotters:
                            p.update(module, batch, pred_na, target_na, mask)
                        for k, m in metrics.items():
                            metric_states[k] = m.update(
                                metric_states[k], pred_na.array, target_na.array, mask
                            )
                module._eval_outputs_cache = None  # free the device targets
                val_loss = (
                    float(np.concatenate(vrows, axis=0).mean())
                    if vrows
                    else float("nan")
                )
                self._log("val_mean_loss", val_loss, global_step)
                self._log("mean_loss_epoch/validation", val_loss, global_step)
                if do_plots and vrows:
                    # (reference: on_validation_epoch_end, lightning.py:944-989)
                    for p in plotters:
                        p.on_step_end(module, label="Valid")
                    for k, m in metrics.items():
                        for name, val in m.compute(metric_states[k], "val").items():
                            if isinstance(val, float):
                                self._log(name, val, global_step)
                            else:
                                for lg in self.loggers:
                                    lg.log_figure(name, val, global_step)

            print(
                f"epoch {epoch + 1}/{max_epochs} "
                f"train_loss={train_loss:.5f} val_loss={val_loss:.5f} "
                f"({sps:.2f} samples/s)"
            )

            # ------------------------------ checkpoint + early stop
            if not cfg.fast_dev_run:
                host_state = self._host_state(state)
                if self.is_main:
                    ckpt.save_last(host_state)
                if not np.isnan(val_loss):
                    # best-tracking state advances identically on every
                    # process (val_loss is identical); only main writes
                    if self.is_main:
                        improved = ckpt.maybe_save_best(host_state, val_loss)
                    else:
                        improved = val_loss < ckpt.best_metric
                        ckpt.best_metric = min(ckpt.best_metric, val_loss)
                    if improved:
                        epochs_no_improve = 0
                    else:
                        epochs_no_improve += 1
                    if epochs_no_improve >= cfg.early_stopping_patience:
                        print(f"Early stopping at epoch {epoch + 1}")
                        break
        if profile_dir is not None:
            jax.profiler.stop_trace()
            print(f"Profiler trace written to {profile_dir}")
        if not cfg.fast_dev_run and self.is_main:
            self._log_model(module, state)
        return state

    def _log_model(self, module: AutoRegressiveModule, state):
        """Export the trained model as a self-describing artifact with an
        INFERRED input/output signature at fit end — the analog of the
        reference's MLflow model logging with infer_signature
        (reference: lightning.py:841-858). Writes signature.json (+ a
        StableHLO forward for grid models) under <save_path>/model and
        pushes the directory to any logger exposing ``log_artifacts``
        (MLflow)."""
        out_dir = self.save_path / "model"
        out_dir.mkdir(parents=True, exist_ok=True)
        num_pred_steps = module.settings.num_pred_steps_val_test
        h, w = module.dataset_info.statics.grid_shape
        spatial = (h * w,) if module.is_graph else (h, w)
        n_in = module.settings.num_input_steps
        inputs_spec = jax.ShapeDtypeStruct(
            (1, n_in) + spatial + (module.num_output_features,), jnp.float32
        )
        forcing_spec = jax.ShapeDtypeStruct(
            (1, num_pred_steps) + spatial + (module.dataset_info.forcing_dim,),
            jnp.float32,
        )

        def predict(params, inputs, forcing):
            buffers = module.step_buffers()
            preds = module._rollout(
                params, inputs, forcing, None, num_pred_steps,
                jax.random.key(0), buffers,
            )
            return preds * buffers["stats_std"] + buffers["stats_mean"]

        out_spec = jax.eval_shape(
            predict, state.params, inputs_spec, forcing_spec
        )
        spatial_names = ["ngrid"] if module.is_graph else ["lat", "lon"]
        signature = {
            "inputs": {
                "prev_states": {
                    "shape": list(inputs_spec.shape),
                    "dtype": str(inputs_spec.dtype),
                    "dims": ["batch", "timestep", *spatial_names, "features"],
                    "feature_names": list(module.output_feature_names),
                },
                "forcing": {
                    "shape": list(forcing_spec.shape),
                    "dtype": str(forcing_spec.dtype),
                    "dims": ["batch", "timestep", *spatial_names, "features"],
                    "feature_names": list(module.forcing_feature_names),
                },
            },
            "outputs": {
                "prediction": {
                    "shape": list(out_spec.shape),
                    "dtype": str(out_spec.dtype),
                    "dims": ["batch", "timestep", *spatial_names, "features"],
                    "feature_names": list(module.output_feature_names),
                    "denormalized": True,
                }
            },
            "model_name": module.settings.model_name,
            "num_params": module.num_params(state),
        }
        with open(out_dir / "signature.json", "w") as f:
            json.dump(signature, f, indent=1)
        if not module.is_graph:
            try:
                from py4cast_tpu.export import export_forward

                # state.params is already the full variables dict
                # ({"params": ...}) as returned by model.init
                export_forward(
                    module.model,
                    jax.device_get(state.params),
                    module.model.input_shape,
                    out_dir / "forward.stablehlo",
                )
            except Exception as e:  # noqa: BLE001 — export is best-effort
                print(f"StableHLO export skipped: {e}")
        for lg in self.loggers:
            if hasattr(lg, "log_artifacts"):
                lg.log_artifacts(out_dir)

    def _dump_run_info(self, module: AutoRegressiveModule):
        """Dump git commit/status + run summary to the run dir for
        reproducibility (reference: lightning.py:421-436)."""
        import subprocess

        info = {"save_path": str(self.save_path)}
        try:
            info["git_commit"] = subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
                timeout=5,
            ).stdout.strip()
            info["git_status"] = subprocess.run(
                ["git", "status", "--short"], capture_output=True, text=True,
                timeout=5,
            ).stdout
        except (OSError, subprocess.SubprocessError):
            pass
        info["model_name"] = module.settings.model_name
        with open(self.save_path / "run_info.json", "w") as f:
            json.dump({k: v for k, v in info.items() if v is not None}, f, indent=1)

    def test(self, module: AutoRegressiveModule, test_ds, state):
        """Scoring loop: per-timestep losses, mae/rmse score cards,
        spatial-error map, PSD/ACC metrics, JSON score files
        (reference: lightning.py:995-1099).

        Multi-host: timestep losses are identical on every process
        (cross-process allgather); PSD/ACC entries appear only in
        process 0's returned dict — the one that writes
        ``test_scores.json``."""
        cfg = self.config
        rng = jax.random.key(0)
        module._plot_loggers = self.loggers
        module.current_epoch = 0
        # score EVERY sample: pad the tail batch instead of dropping it
        # (static shapes; padded rows masked out below)
        loader = test_ds.loader(
            batch_size=cfg.batch_size, num_workers=cfg.num_workers,
            drop_last=False, pad_last=True,
        )

        plotters, metrics, metric_states = [], {}, {}
        # multi-host: named_eval_arrays below is a collective run by all
        # processes; plotters/metrics/score files are process-0 only (the
        # update/compute loops no-op elsewhere — empty lists/dicts)
        if cfg.logging_enabled and self.is_main:
            # (reference: on_test_start, lightning.py:995-1015)
            plotters = [
                StateErrorPlot(
                    {
                        "mae": module.make_scaled_loss("mae"),
                        "rmse": module.make_scaled_loss("rmse"),
                    },
                    prefix="Test",
                    save_path=self.save_path,
                ),
                SpatialErrorPlot(prefix="Test", save_path=self.save_path),
                PredictionTimestepPlot(
                    num_samples_to_plot=cfg.num_samples_to_plot,
                    prefix="Test",
                    save_path=self.save_path,
                ),
            ]
            metrics = module.make_metrics(
                self.save_path, module.settings.num_pred_steps_val_test
            )
            metric_states = {k: m.init_state() for k, m in metrics.items()}

        per_sample_rows = []  # (valid_count, T) per batch
        for i, batch in enumerate(loader):
            if cfg.limit_val_batches and i >= cfg.limit_val_batches:
                break
            rng, step_rng = jax.random.split(rng)
            preds, per_step = module.eval_step(state, batch, step_rng)
            rows = to_host(per_step)  # GLOBAL (B, T) rows
            nv = batch.num_valid if batch.num_valid else rows.shape[0]
            per_sample_rows.append(rows[:nv])
            if cfg.logging_enabled:
                pred_na, target_na, mask = module.named_eval_arrays(preds, batch)
                for p in plotters:
                    p.update(module, batch, pred_na, target_na, mask)
                for k, m in metrics.items():
                    metric_states[k] = m.update(
                        metric_states[k], pred_na.array, target_na.array, mask
                    )
        module._eval_outputs_cache = None  # free the device targets
        if not per_sample_rows:
            return {}
        # sample-weighted mean: every real sample counts once, padded
        # rows never do (tail batches may be short)
        mean_per_step = np.concatenate(per_sample_rows, axis=0).mean(axis=0)
        scores = {
            f"timestep_losses/test_step_{s}": float(v)
            for s, v in enumerate(mean_per_step)
        }
        scores["test_mean_loss"] = float(np.mean(mean_per_step))
        if cfg.logging_enabled:
            # (reference: on_test_epoch_end, lightning.py:1065-1099)
            for p in plotters:
                p.on_step_end(module, label="Test")
            for k, m in metrics.items():
                for name, val in m.compute(metric_states[k], "test").items():
                    if isinstance(val, float):
                        scores[name] = val
                    else:
                        for lg in self.loggers:
                            lg.log_figure(name, val, 0)
        if self.is_main:
            with open(self.save_path / "test_scores.json", "w") as f:
                json.dump(scores, f, indent=1)
        for k, v in scores.items():
            self._log(k, v, 0)
        return scores

    def predict(self, module: AutoRegressiveModule, infer_ds, state) -> List[NamedArray]:
        cfg = self.config
        rng = jax.random.key(0)
        # export EVERY sample: pad the tail batch, slice padding back off
        loader = infer_ds.loader(
            batch_size=cfg.batch_size, num_workers=cfg.num_workers,
            drop_last=False, pad_last=True,
        )
        preds = []
        for batch in loader:
            rng, step_rng = jax.random.split(rng)
            p = module.predict_step(state, batch, step_rng)
            arr = to_host(p.array)  # GLOBAL rows; numpy on every host
            nv = batch.num_valid if batch.num_valid else arr.shape[0]
            preds.append(NamedArray(arr[:nv], p.names, p.feature_names))
        return preds
