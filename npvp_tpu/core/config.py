"""Typed configuration system.

Mirrors the reference's Hydra/OmegaConf YAML schema (groups ``Env``, ``Dataset``,
``AE``, ``Predictor`` — see reference configs/config_KTH_Unified_NPVP-S.yaml) with
dataclasses, so every reference YAML translates key-for-key, and adds what the
reference lacks (reference survey §5.6): schema validation, a single base config
with small per-experiment overlays, and ``key.path=value`` CLI overrides.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional, Sequence

try:  # PyYAML is available transitively; gate anyway.
    import yaml

    _HAVE_YAML = True
except Exception:  # pragma: no cover
    _HAVE_YAML = False


@dataclasses.dataclass
class EnvConfig:
    """Runtime environment (reference Env group)."""

    world_size: int = 1  # informational; JAX discovers devices itself
    rand_seed: int = 3047
    visual_callback: bool = True
    # TPU-native additions
    mesh_shape: tuple = (("data", -1),)  # -1 = all devices on that axis
    compute_dtype: str = "bfloat16"  # dtype for matmul/conv compute
    param_dtype: str = "float32"
    profile_dir: Optional[str] = None  # jax.profiler trace output
    debug_nans: bool = False  # survey §5.2: jax_debug_nans sanitizer mode
    # shard activations' spatial H axis over the model mesh axis (Megatron-SP
    # layout; see core.mesh.sequence_parallel). Needs mesh_shape model > 1.
    sequence_parallel: bool = False
    # ZeRO-3 fully-sharded data parallelism: parameters + optimizer moments
    # sharded over the data axis (core.mesh.tree_shardings fsdp rules); XLA
    # all-gathers params per use and reduce-scatters gradients. Composes
    # with TP/SP. Per-device state memory scales down by the data-axis size.
    fsdp: bool = False
    # gradient steps executed per device dispatch (lax.scan over a stacked
    # chunk of batches). >1 amortizes host→device dispatch latency — decisive
    # on high-RTT runtimes (the tunneled chip pays 10-1000 ms per dispatch);
    # identical math/rng stream to per-step dispatch (tests/test_training.py)
    steps_per_dispatch: int = 1
    # force a JAX backend ("cpu" runs quality/eval tools off-TPU while the
    # chip trains; None keeps the environment default). Applied in
    # train.common.setup() before first backend use — the axon
    # sitecustomize pins jax_platforms, so env vars alone cannot override.
    platform: Optional[str] = None


@dataclasses.dataclass
class DatasetConfig:
    name: str = "SMMNIST"  # KTH | SMMNIST | BAIR | Cityscapes | KITTI
    dir: str = "./data"
    dev_set_size: Optional[int] = None
    num_workers: int = 8
    img_channels: int = 1
    img_size: int = 64  # 64 for KTH/SMMNIST/BAIR, 128 for Cityscapes/KITTI
    num_past_frames: int = 5
    num_future_frames: int = 10
    test_num_past_frames: int = 5
    test_num_future_frames: int = 10
    batch_size: int = 8
    phase: str = "deploy"  # 'debug' => real val split; 'deploy' => val == train


@dataclasses.dataclass
class AEConfig:
    """Stage-1 frame autoencoder (reference AE group)."""

    ckpt_save_dir: str = "./ckpts/AE"
    tensorboard_save_dir: str = "./ckpts/AE_tb"
    resume_ckpt: Optional[str] = None
    start_epoch: int = 0
    epochs: int = 500
    AE_lr: float = 1e-4
    ngf: int = 64
    n_downsampling: int = 3
    num_res_blocks: int = 2
    out_layer: str = "Tanh"  # 'Sigmoid' for SM-MNIST
    learn_3d: bool = False
    # TPU-native: sub-pixel (stride-4) form of the 7×7 output head — exact
    # math, same parameters (nn/upsample.subpixel_conv_same); measured a
    # wash at flagship shapes, available for larger heads
    s2d_head: bool = False
    log_per_epochs: int = 2


@dataclasses.dataclass
class PredictorConfig:
    """Stage-2 NP predictor (reference Predictor group)."""

    ckpt_save_dir: str = "./ckpts/Predictor"
    tensorboard_save_dir: str = "./ckpts/Predictor_tb"
    resume_ckpt: Optional[str] = None
    init_det_ckpt_for_vae: Optional[str] = None
    resume_AE_ckpt: str = ""
    start_epoch: int = 0
    epochs: int = 600
    log_per_epochs: int = 5
    # checkpoint every N epochs (1 = reference behavior). On tunneled
    # runtimes a save pulls the full optimizer state device→host (~1.2 GB at
    # flagship scale), so sparser saves matter for wall-clock.
    ckpt_per_epochs: int = 1
    # retention count (reference ModelCheckpoint save_top_k=epochs keeps
    # every epoch — ~0.5-1 GB each at flagship scale; None reproduces that,
    # an int caps disk at best-N-by-val-loss, which is what long supervised
    # runs on a bounded filesystem need)
    ckpt_max_keep: Optional[int] = 10

    rand_context: bool = False
    min_lo: int = 4
    max_lo: int = 16

    VFI: bool = False
    context_num_p: int = 5
    context_num_f: int = 5
    num_interpolate: int = 10

    max_H: int = 8
    max_W: int = 8
    max_T: int = 15

    embed_dim: int = 512
    fuse_method: str = "Add"  # 'Add' | 'SPADE'
    param_free_norm_type: str = "layer"
    evt_former: bool = True
    evt_former_num_layers: int = 4
    evt_hidden_channels: int = 256
    stochastic: bool = False
    transformer_layers: int = 8

    # transformer hyperparameters (reference Predictor.__init__ defaults,
    # models/Predictor.py:270)
    num_heads: int = 8
    window_size: int = 4
    dropout: float = 0.1
    drop_path: float = 0.1
    Spatial_FFN_hidden_ratio: int = 4
    dim_feedforward: int = 1024

    predictor_lr: float = 1e-4
    max_grad_norm: float = 1.0
    use_cosine_scheduler: bool = True
    scheduler_eta_min: float = 1e-7
    scheduler_T0: int = 150

    lam_PF_L1: float = 0.01
    KL_beta: float = 1e-8

    use_gan: bool = False  # deprecated in reference; kept for schema parity
    lam_gan: float = 0.001
    ndf: int = 64

    # TPU-native addition: execution mode of the compute path.
    #   "xla"  — composable XLA ops (training + serving default)
    #   "int8" — dynamic-int8 serving matmuls (kept for compute-bound
    #            shapes; at this model's bandwidth-bound widths it measured
    #            SLOWER end-to-end — DESIGN.md round-2 findings)
    # Training always uses "xla". A "pallas" mode existed and was deleted
    # after losing its A/B (npvp_tpu/kernels/__init__.py).
    exec_mode: str = "xla"
    # TPU-native addition: rematerialize each transformer block in the
    # backward pass (jax.checkpoint) — trades ~1/3 more FLOPs for O(layers)
    # less activation HBM, enabling larger batches/resolutions per chip.
    remat: bool = False


@dataclasses.dataclass
class Config:
    Env: EnvConfig = dataclasses.field(default_factory=EnvConfig)
    Dataset: DatasetConfig = dataclasses.field(default_factory=DatasetConfig)
    AE: AEConfig = dataclasses.field(default_factory=AEConfig)
    Predictor: PredictorConfig = dataclasses.field(default_factory=PredictorConfig)

    def validate(self) -> "Config":
        p, d = self.Predictor, self.Dataset
        clip = d.num_past_frames + d.num_future_frames
        if p.max_T != clip:
            raise ValueError(
                f"Predictor.max_T ({p.max_T}) must equal num_past_frames + "
                f"num_future_frames ({clip})"
            )
        if p.VFI:
            vfi_clip = p.context_num_p + p.context_num_f + p.num_interpolate
            if vfi_clip != clip:
                raise ValueError(
                    f"VFI frames ({vfi_clip}) incompatible with clip length {clip}"
                )
        if p.rand_context and not (1 <= p.min_lo <= p.max_lo < p.max_T):
            # the rand-context split point lo ∈ [min_lo, max_lo] must leave
            # at least one observed and one target frame in a max_T clip
            # (reference collate, utils/dataset.py:162-178) — out-of-range
            # values silently produce an all-observed/no-target batch whose
            # failure mode is an opaque shape error deep in the model
            raise ValueError(
                f"rand_context needs 1 <= min_lo ({p.min_lo}) <= max_lo "
                f"({p.max_lo}) < max_T ({p.max_T})")
        if p.embed_dim % p.num_heads != 0:
            raise ValueError("embed_dim must be divisible by num_heads")
        if p.fuse_method not in ("Add", "SPADE"):
            raise ValueError(f"unknown fuse_method {p.fuse_method!r}")
        if p.exec_mode not in ("xla", "int8", "pallas"):
            raise ValueError(f"unknown exec_mode {p.exec_mode!r}")
        if self.AE.out_layer not in ("Tanh", "Sigmoid"):
            raise ValueError(f"unsupported AE.out_layer {self.AE.out_layer!r}")
        return self

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def save(self, path: str | Path) -> None:
        """Persist the resolved config next to checkpoints (reference keeps a
        source snapshot in ckpts, utils/train_summary.py:202-231; we keep the
        resolved config instead)."""
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(json.dumps(self.to_dict(), indent=2, default=str))


_GROUPS = {"Env": EnvConfig, "Dataset": DatasetConfig, "AE": AEConfig,
           "Predictor": PredictorConfig}


def _coerce(value: Any, target_type: Any) -> Any:
    if value is None:
        return None
    if target_type is bool and isinstance(value, str):
        return value.lower() in ("1", "true", "yes")
    if target_type in (int, float) and isinstance(value, str):
        return target_type(value)
    if target_type is float and isinstance(value, int):
        return float(value)
    return value


def _apply_group(dc: Any, values: dict, group_name: str) -> None:
    fields = {f.name: f for f in dataclasses.fields(dc)}
    for key, val in values.items():
        if key not in fields:
            raise KeyError(f"unknown config key {group_name}.{key}")
        ftype = fields[key].type
        base = {"int": int, "float": float, "bool": bool, "str": str}.get(
            str(ftype).replace("Optional[", "").replace("]", ""), None
        )
        setattr(dc, key, _coerce(val, base) if base else val)


def from_dict(d: dict) -> Config:
    cfg = Config()
    for group_name, values in d.items():
        if group_name not in _GROUPS:
            raise KeyError(f"unknown config group {group_name}")
        if values:
            _apply_group(getattr(cfg, group_name), values, group_name)
    return cfg


def load_config(path: str | Path, overrides: Sequence[str] = ()) -> Config:
    """Load a YAML/JSON config file and apply ``Group.key=value`` overrides."""
    text = Path(path).read_text()
    if str(path).endswith(".json"):
        data = json.loads(text)
    else:
        if not _HAVE_YAML:
            raise RuntimeError("PyYAML unavailable; use JSON configs")
        data = yaml.safe_load(text)
    cfg = from_dict(data or {})
    apply_overrides(cfg, overrides)
    return cfg.validate()


def apply_overrides(cfg: Config, overrides: Sequence[str]) -> Config:
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override must be Group.key=value, got {item!r}")
        dotted, val = item.split("=", 1)
        parts = dotted.split(".")
        if len(parts) != 2 or parts[0] not in _GROUPS:
            raise ValueError(f"override path must be Group.key, got {dotted!r}")
        group = getattr(cfg, parts[0])
        if not _HAVE_YAML:
            parsed = val
        else:
            parsed = yaml.safe_load(val)
        _apply_group(group, {parts[1]: parsed}, parts[0])
    return cfg
