"""GPipe-style pipeline parallelism over a mesh axis.

The reference has no pipeline parallelism (survey §2.5: its only parallelism
is single-node DDP, train_*_lightning.py); the NPVP architecture also fits a
single chip at every published scale, which is why PP is off by default
here. This module still provides it as a first-class capability for
deeper/wider variants: stages are laid out along a ``pipe`` mesh axis,
microbatches stream through ``jax.lax.ppermute`` inside ``shard_map``, and
the whole schedule is one ``lax.scan`` — XLA sees a single static program of
S + M - 1 ticks (pipeline bubble included), with no host control flow and no
hand-written communication beyond the stage-to-stage permute.

The target shape is a stack of L identical blocks (the VidHRFormer
decoder's ``layer_{i}`` modules): stack the per-layer param trees along a
new leading axis, shard that axis over ``pipe`` (each stage holds L/S
layers), and pass the single-layer apply function. Equivalence to the
sequential loop is exact up to reduction order (tests/test_pipeline.py).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIPE_AXIS = "pipe"


def stack_layer_params(layer_trees: list) -> Any:
    """Stack per-layer pytrees (identical structure) along a new leading
    axis: L trees of leaves (…) → one tree of leaves (L, …)."""
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *layer_trees)


def make_pipeline_mesh(stages: int, data: int = 1) -> Mesh:
    """A (data, pipe) mesh over the first ``data * stages`` devices, pipe
    innermost so stage-to-stage permutes ride the fastest links."""
    import numpy as np

    devices = jax.devices()[: data * stages]
    if len(devices) < data * stages:
        raise ValueError(f"need {data * stages} devices, "
                         f"have {len(jax.devices())}")
    return Mesh(np.asarray(devices).reshape(data, stages),
                ("data", PIPE_AXIS))


def pipeline_apply(fn: Callable[[Any, Any], Any], stacked_params: Any,
                   microbatches: Any, *, mesh: Mesh,
                   axis: str = PIPE_AXIS,
                   data_axis: str | None = None) -> Any:
    """Apply an L-layer stack as an S-stage pipeline (S = mesh[axis]).

    fn(layer_params, x) -> y          one block; x and y share a shape
    stacked_params                    pytree, leaves (L, …); L % S == 0
    microbatches                      pytree, leaves (M, …) — M microbatches

    Returns outputs shaped like ``microbatches``: element m equals
    fn(layer L-1, … fn(layer 0, microbatches[m])) — the sequential stack —
    computed with S stages working on consecutive microbatches concurrently.
    Ticks run t = 0 … M+S-2; stage s processes microbatch t-s at tick t, so
    utilization is M/(M+S-1) — choose M ≥ S to amortize the bubble.

    All arrays are passed through ``shard_map``: the layer axis of
    ``stacked_params`` is split over ``axis`` (each stage holds its L/S
    layers); microbatches are replicated along ``axis``. ``data_axis``
    composes PP×DP: every microbatch leaf's *second* dimension (the batch
    within a microbatch) is split over that mesh axis, so each (data, pipe)
    device row pipelines its own batch shard — stage-to-stage permutes move
    only local shards and no cross-data-axis communication is added.
    """
    S = mesh.shape[axis]
    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if L % S:
        raise ValueError(f"{L} layers not divisible by {S} stages")
    M = jax.tree_util.tree_leaves(microbatches)[0].shape[0]

    def per_stage(params, xs):
        # params: (L/S, …) local layers; xs: (M, …) full microbatch stack
        stage = jax.lax.axis_index(axis)
        zero = jax.tree_util.tree_map(lambda l: jnp.zeros_like(l[0]), xs)

        def run_stage(h):
            # sequentially apply this stage's L/S layers
            def body(carry, layer_params):
                return fn(layer_params, carry), None

            out, _ = jax.lax.scan(body, h, params)
            return out

        def tick(carry, t):
            h_prev, out = carry
            # stage 0 reads microbatch t (clamped — garbage ticks are
            # masked out of the output collection below); later stages
            # read the activation permuted from their predecessor
            x_in = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, jnp.clip(t, 0, M - 1), keepdims=False), xs)
            h = jax.tree_util.tree_map(
                lambda a, b: jnp.where(stage == 0, a, b), x_in, h_prev)
            y = run_stage(h)
            # shift activations one stage down the pipe
            perm = [(i, (i + 1) % S) for i in range(S)]
            h_next = jax.tree_util.tree_map(
                lambda a: jax.lax.ppermute(a, axis, perm), y)
            # the last stage emits microbatch t-(S-1) at tick t
            m = t - (S - 1)
            valid = (stage == S - 1) & (m >= 0)

            def put(buf, val):
                upd = jax.lax.dynamic_update_index_in_dim(
                    buf, jnp.where(valid, val, jax.lax.dynamic_index_in_dim(
                        buf, jnp.clip(m, 0, M - 1), keepdims=False)),
                    jnp.clip(m, 0, M - 1), 0)
                return upd

            out = jax.tree_util.tree_map(put, out, y)
            return (h_next, out), None

        out0 = jax.tree_util.tree_map(jnp.zeros_like, xs)
        (_, out), _ = jax.lax.scan(tick, (zero, out0),
                                   jnp.arange(M + S - 1))
        # only the last stage holds real outputs; broadcast them along the
        # pipe axis with a masked psum so out_specs can replicate
        out = jax.tree_util.tree_map(
            lambda a: jax.lax.psum(
                jnp.where(stage == S - 1, a, jnp.zeros_like(a)), axis), out)
        return out

    pspec = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    xp = P(None, data_axis) if data_axis else P()
    xspec = jax.tree_util.tree_map(lambda _: xp, microbatches)
    shmapped = jax.shard_map(
        per_stage, mesh=mesh, in_specs=(pspec, xspec),
        out_specs=xspec, check_vma=False)
    return shmapped(stacked_params, microbatches)
