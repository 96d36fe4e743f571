"""Device mesh + sharding rules.

The reference's only parallelism is single-node DDP over NCCL (survey §2.5);
here parallelism is expressed the TPU way: one `jax.sharding.Mesh` with a
``data`` axis (batch/gradient parallelism — collectives emitted by jit) and a
``model`` axis (Megatron-style tensor parallelism over attention heads and FFN
hidden dims of the VidHRFormer). Gradient all-reduce, sync-BN statistics and
metric reductions all ride the mesh through XLA collectives — there is no
hand-written communication code to test or deadlock (reference's acknowledged
multi-GPU callback hang, configs/config_KTH_Autoencoder.yaml:6, has no
equivalent here).
"""

from __future__ import annotations

import contextlib
import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[list] = None,
              batch_size: Optional[int] = None) -> Mesh:
    """Create a (data, model) mesh. ``data=-1`` consumes all remaining
    devices. Axis order puts ``model`` innermost so tensor-parallel
    collectives ride the fastest ICI links.

    When ``batch_size`` is given, the data axis is clamped to its largest
    divisor ≤ the device count (using a device subset if necessary) so tiny
    debug batches still run on large meshes."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if batch_size is not None and batch_size % data:
        import math

        data = math.gcd(data, batch_size)
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} > {n} devices")
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel rules for the VidHRFormer (path-regex → PartitionSpec).
# q/k/v projections are column-split by head, output projections row-split;
# FFN first matmul column-split, second row-split — jit inserts the psum
# after row-split matmuls via sharding propagation.
_TP_RULES = (
    (re.compile(r".*/(wq|wk|wv)/kernel$"), P(None, MODEL_AXIS, None)),
    (re.compile(r".*/(wq|wk|wv)/bias$"), P(MODEL_AXIS, None)),
    (re.compile(r".*/wo/kernel$"), P(MODEL_AXIS, None, None)),
    (re.compile(r".*/linear1/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r".*/linear1/bias$"), P(MODEL_AXIS)),
    (re.compile(r".*/linear2/kernel$"), P(MODEL_AXIS, None)),
)


def param_spec(path: str) -> P:
    for pattern, spec in _TP_RULES:
        if pattern.match(path):
            return spec
    return P()


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/" + "/".join(parts)


# ZeRO-3-style fully-sharded data parallelism: parameters and optimizer
# moments are sharded over the *data* axis on their largest free (non-TP)
# dimension; XLA's SPMD partitioner inserts the all-gather before each use
# and the reduce-scatter on the gradient — the standard JAX FSDP recipe
# (no hand-written communication; composes with the TP rules, which claim
# their dims first). Per-device parameter+moment memory scales down by the
# data-axis size. Leaves below FSDP_MIN_SIZE elements (biases, norm scales,
# schedule counters) stay replicated: sharding them saves nothing and adds
# per-use collectives.
FSDP_MIN_SIZE = 2 ** 15


def _with_fsdp(spec: P, shape, data_size: int) -> P:
    """Extend a (possibly TP-assigned) PartitionSpec with the data axis on
    the largest still-unassigned dimension that divides ``data_size``."""
    if int(np.prod(shape)) < FSDP_MIN_SIZE:
        return spec
    dims = list(spec) + [None] * (len(shape) - len(spec))
    cands = [d for d in range(len(shape))
             if dims[d] is None and shape[d] >= data_size
             and shape[d] % data_size == 0]
    if not cands:
        return spec
    dims[max(cands, key=lambda d: shape[d])] = DATA_AXIS
    return P(*dims)


def tree_shardings(mesh: Mesh, tree: Any, fsdp: bool = False,
                   tp: bool = True) -> Any:
    """NamedSharding pytree for any state pytree. The TP path rules match on
    path *suffixes*, so they apply equally to params and to optimizer moments
    (whose optax paths embed the parameter path). ``fsdp=True`` additionally
    shards every large leaf over the data axis (ZeRO-3); ``tp=False`` skips
    the TP rules (the stage-1 AE trainer, whose attention modules are not
    head-split)."""
    def assign(path, leaf):
        spec = param_spec(_path_str(path)) if tp else P()
        axis_size = mesh.shape[MODEL_AXIS]
        shape = getattr(leaf, "shape", ())
        for dim, name in enumerate(spec):
            # guard: only shard dims divisible by the axis size
            if name == MODEL_AXIS and (dim >= len(shape)
                                       or shape[dim] % axis_size):
                spec = P()
                break
        if fsdp and mesh.shape[DATA_AXIS] > 1:
            spec = _with_fsdp(spec, shape, mesh.shape[DATA_AXIS])
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, tree)


def param_shardings(mesh: Mesh, params: Any, fsdp: bool = False) -> Any:
    """NamedSharding pytree for a parameter pytree (TP rules + replication)."""
    return tree_shardings(mesh, params, fsdp=fsdp)


def shard_state(mesh: Mesh, state: Any, fsdp: bool = False) -> Any:
    """Place a full train state on the mesh (params + optimizer moments get
    the TP layout — plus ZeRO-3 data-axis sharding under ``fsdp``; everything
    else replicated). jit then follows these placements — no explicit
    in_shardings needed at the call site."""
    return jax.device_put(state, tree_shardings(mesh, state, fsdp=fsdp))


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a parameter pytree on the mesh according to the TP rules."""
    return jax.device_put(params, param_shardings(mesh, params))


# ---------------------------------------------------------------------------
# Sequence/context parallelism (survey §2.5 "shard N·H·W")
# ---------------------------------------------------------------------------
#
# The VidHRFormer's structure makes the spatial H axis an almost
# communication-free model-parallel dimension: window attention is
# independent per window row, temporal and cross attention are independent
# per (h, w) site, and the FFN 1×1 convs are independent per position. Only
# the depthwise 3×3 conv (one-row halo) and the per-frame LayerNorm
# statistics (scalar psum) cross shard boundaries — and XLA's SPMD
# partitioner inserts exactly those collectives from sharding constraints;
# there is no hand-written communication code. Activating it is a context:
#
#     with sequence_parallel(mesh):
#         out = jitted_forward(...)
#
# Inside the context, the transformer stacks constrain their (N, T, H, W, C)
# activations to P(data, None, model) at every block boundary, so activation
# memory and elementwise work scale down by the model-axis size (Megatron-SP
# layout; the head-split TP rules still apply to the matmuls themselves).

_SP_MESH: Optional[Mesh] = None


@contextlib.contextmanager
def sequence_parallel(mesh: Optional[Mesh]):
    """Enable spatial sequence-parallel activation sharding on ``mesh``'s
    model axis for jit traces entered inside the context.

    The context is consulted at *trace* time: constraints are baked into the
    compiled program, and jax's jit cache is keyed by function identity — so
    wrap the first (tracing) call, and do not reuse one jitted function both
    inside and outside the context."""
    global _SP_MESH
    prev, _SP_MESH = _SP_MESH, mesh
    try:
        yield
    finally:
        _SP_MESH = prev


def enable_sequence_parallel(mesh: Optional[Mesh]) -> None:
    """Process-lifetime form of :func:`sequence_parallel` (trainers call this
    from ``train.common.setup`` when ``Env.sequence_parallel`` is set)."""
    global _SP_MESH
    _SP_MESH = mesh


def sp_shard(x):
    """Constrain a (N, T, H, W, ...) activation to batch-over-data,
    H-over-model. No-op when no :func:`sequence_parallel` context is active
    or the model axis is trivial; each axis is constrained only when its size
    divides its mesh axis (init-time traces use batch 1, for example)."""
    mesh = _SP_MESH
    if mesh is None or mesh.shape.get(MODEL_AXIS, 1) == 1 or x.ndim < 3:
        return x
    data = DATA_AXIS if x.shape[0] % mesh.shape[DATA_AXIS] == 0 else None
    model = MODEL_AXIS if x.shape[2] % mesh.shape[MODEL_AXIS] == 0 else None
    if model is None:
        return x
    spec = P(data, None, model)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def shard_batch(mesh: Mesh, batch: Any,
                multihost: Optional[bool] = None) -> Any:
    """Place a batch pytree with its leading axis split over the data axis.

    Single-process: a plain device_put. Multi-host: each process holds only
    its shard of the global batch (BatchLoader shards the dataset by
    process_index — the DistributedSampler equivalent), so the global array
    is assembled from process-local data via
    ``jax.make_array_from_process_local_data``; the per-leaf global batch
    dimension is local_batch · process_count. Mask-like leaves whose leading
    axis is not the batch (e.g. (T,) obs/tgt masks) are replicated.

    ``multihost`` forces the assembly path (tests exercise it with one
    process, where it degenerates to a device_put-equivalent placement).
    """
    sharding = batch_sharding(mesh)
    rep = replicated(mesh)
    if multihost is None:
        multihost = jax.process_count() > 1

    def spec_for(path, leaf):
        name = _path_str(path)
        is_mask = name.endswith("_mask") or np.ndim(leaf) <= 1
        return rep if is_mask else sharding

    if not multihost:
        return jax.tree_util.tree_map_with_path(
            lambda p, x: jax.device_put(x, spec_for(p, x)), batch)

    def place(path, leaf):
        leaf = np.asarray(leaf)
        return jax.make_array_from_process_local_data(spec_for(path, leaf),
                                                      leaf)

    return jax.tree_util.tree_map_with_path(place, batch)
