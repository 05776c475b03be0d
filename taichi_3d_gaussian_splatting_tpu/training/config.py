"""YAML -> nested dataclass config, replacing dataclass_wizard.YAMLWizard.

Behavioral reference: GaussianPointTrainer.py:33-63 (TrainConfig and its
nested sub-configs). Key handling matches the reference's observed behavior:
kebab-case and snake_case keys both accepted, unknown/typo'd keys tolerated
(e.g. `position_learning_rateo` in config/tat_truck_every_8_test.yaml).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Type, TypeVar

import yaml

from taichi_3d_gaussian_splatting_tpu.models.scene import SceneConfig
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import RasterizerConfig
from taichi_3d_gaussian_splatting_tpu.training.controller import ControllerConfig
from taichi_3d_gaussian_splatting_tpu.training.loss import LossConfig

T = TypeVar("T")


def _from_dict(cls: Type[T], data: Any) -> T:
    if data is None:
        return cls()
    assert isinstance(data, dict), f"expected mapping for {cls.__name__}"
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in data.items():
        name = key.replace("-", "_")
        if name not in fields:
            continue  # tolerate unknown keys like the reference
        f = fields[name]
        if dataclasses.is_dataclass(f.type) or (
            isinstance(f.type, str) and f.type in _NESTED
        ):
            sub_cls = f.type if dataclasses.is_dataclass(f.type) else _NESTED[f.type]
            kwargs[name] = _from_dict(sub_cls, value)
        else:
            kwargs[name] = _coerce_scalar(f.type, name, value)
    return cls(**kwargs)


def _coerce_scalar(ftype, name: str, value):
    """Coerce YAML scalars to the annotated field type.

    PyYAML's safe_load follows YAML 1.1, where dotless exponents like
    `1e-5` parse as STRINGS — the reference's dataclass_wizard coerced
    them, so configs in the wild rely on it (e.g. learning rates)."""
    if value is None:
        return None
    t = str(ftype).replace("Optional[", "").rstrip("]")
    try:
        if t == "float":
            return float(value)
        if t == "int":
            return int(value)
        if t == "bool" and isinstance(value, str):
            return value.strip().lower() in ("1", "true", "yes", "on")
    except (TypeError, ValueError) as e:
        raise ValueError(
            f"config field {name!r} expects {t}, got {value!r}") from e
    return value


@dataclass(frozen=True)
class TrainConfig:
    """Mirrors GaussianPointTrainer.TrainConfig (reference :33-63), with
    TPU-specific additions at the bottom."""

    train_dataset_json_path: str = ""
    val_dataset_json_path: str = ""
    pointcloud_parquet_path: str = ""
    num_iterations: int = 300000
    val_interval: int = 1000
    feature_learning_rate: float = 1e-3
    position_learning_rate: float = 1e-5
    position_learning_rate_decay_rate: float = 0.97
    position_learning_rate_decay_interval: int = 100
    increase_color_max_sh_band_interval: int = 1000
    log_loss_interval: int = 10
    log_metrics_interval: int = 100
    print_metrics_to_console: bool = False
    log_image_interval: int = 1000
    enable_taichi_kernel_profiler: bool = False  # accepted, unused on TPU
    log_taichi_kernel_profile_interval: int = 1000
    log_validation_image: bool = True
    initial_downsample_factor: int = 4
    half_downsample_factor_interval: int = 250
    summary_writer_log_dir: str = "logs"
    output_model_dir: Optional[str] = None
    rasterisation_config: RasterizerConfig = field(default_factory=RasterizerConfig)
    adaptive_controller_config: ControllerConfig = field(default_factory=ControllerConfig)
    gaussian_point_cloud_scene_config: SceneConfig = field(default_factory=SceneConfig)
    loss_function_config: LossConfig = field(default_factory=LossConfig)
    # --- TPU-specific ---
    train_slim: bool = True                # train steps blend only the rgb
                                           # channels (depth/count images
                                           # re-render on demand at image-
                                           # log cadence); ~4 ms/step saved
                                           # at 428k. Gradients identical.
    seed: int = 0
    resume_from: Optional[str] = None      # full-state checkpoint dir
    save_full_checkpoint: bool = True      # write checkpoint_latest at vals
    num_data_threads: int = 4
    steps_per_dispatch: int = 1            # >1: lax.scan windows of steps
    enable_jax_profiler: bool = False      # jax.profiler trace into log dir
    jax_profiler_start_iteration: int = 200
    jax_profiler_num_iterations: int = 20
    data_parallel_devices: int = 1         # cameras sharded across a mesh
    tile_parallel_devices: int = 1         # ONE camera's tile rows sharded
                                           # across a band mesh (large
                                           # images; excludes data_parallel)
    # multi-host SPMD (parallel/multihost.py): join jax.distributed and
    # train over the GLOBAL device mesh (flat data axis over ICI + DCN),
    # each host loading only its local devices' cameras. On TPU pods the
    # coordinator fields may stay None (read from the environment).
    multihost: bool = False
    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    # camera pose refinement (the reference's open TODO, README.md:318 —
    # it declares pose grads but never computes them; we optimize a
    # per-train-image se(3) delta jointly with the scene)
    pose_refinement: bool = False
    pose_learning_rate: float = 1e-4
    pose_refinement_warm_up: int = 500     # iterations before poses move


_NESTED = {
    "RasterizerConfig": RasterizerConfig,
    "ControllerConfig": ControllerConfig,
    "SceneConfig": SceneConfig,
    "LossConfig": LossConfig,
}


def load_config(path: str) -> TrainConfig:
    with open(path) as f:
        data = yaml.safe_load(f)
    return _from_dict(TrainConfig, data)


def from_dict(data: dict) -> TrainConfig:
    return _from_dict(TrainConfig, data)


def _to_dict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        return {
            f.name: _to_dict(getattr(obj, f.name))
            for f in dataclasses.fields(obj)
        }
    return obj


def save_template(path: str) -> None:
    """--gen_template_only equivalent (gaussian_point_train.py:12-15)."""
    with open(path, "w") as f:
        yaml.safe_dump(_to_dict(TrainConfig()), f, sort_keys=False)
