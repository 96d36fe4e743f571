"""Stage-1 trainer: frame autoencoder with L1 reconstruction.

Functional rebuild of the reference stage-1 pipeline
(reference train_AutoEncoder_lightning.py + models/ResNetAutoEncoder.py:13-49):
concat(past, future) → encoder → decoder → L1, Adam(0.5, 0.999), per-epoch
validation driving best-checkpoint retention, GIF visual callback.

TPU design: one jitted, donated train step; batch sharded over the mesh's
``data`` axis (gradient all-reduce and cross-replica BN statistics are
emitted by jit — the DDP + sync_batchnorm equivalent).
"""

from __future__ import annotations

import sys
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from npvp_tpu.core.checkpoint import CheckpointManager
from npvp_tpu.core.config import Config
from npvp_tpu.core.metrics import (AverageMeters, MetricsLogger,
                                   is_main_process, save_clip_gifs)
from npvp_tpu.core.mesh import replicated, shard_batch
from npvp_tpu.core.optim import make_ae_optimizer
from npvp_tpu.core.train_state import TrainState, param_count
from npvp_tpu.data.loader import DataModule
from npvp_tpu.nn.losses import l1_loss
from npvp_tpu.nn.resnet_ae import FrameAutoEncoder
from npvp_tpu.train.common import (build_argparser, compute_dtype,
                                   maybe_start_profiler, stop_profiler,
                                   load_cli_config, setup)


def build_ae(cfg: Config, dtype) -> FrameAutoEncoder:
    return FrameAutoEncoder(
        img_channels=cfg.Dataset.img_channels, ngf=cfg.AE.ngf,
        n_downsampling=cfg.AE.n_downsampling,
        num_res_blocks=cfg.AE.num_res_blocks, out_layer=cfg.AE.out_layer,
        learn_3d=cfg.AE.learn_3d, s2d_head=cfg.AE.s2d_head, dtype=dtype)


def init_state(cfg: Config, ae: FrameAutoEncoder, sample_shape) -> TrainState:
    variables = ae.init(jax.random.key(cfg.Env.rand_seed),
                        jnp.zeros(sample_shape, jnp.float32))
    tx = make_ae_optimizer(cfg.AE.AE_lr)
    return TrainState.create(apply_fn=ae.apply, params=variables["params"],
                             batch_stats=variables.get("batch_stats", {}),
                             tx=tx)


def make_steps(ae: FrameAutoEncoder, mesh, state_shardings=None):
    """Build the jitted train/eval steps with mesh shardings.

    ``state_shardings`` (a NamedSharding pytree matching the TrainState) pins
    the output state layout — replicated by default; the ZeRO-3 layout when
    ``Env.fsdp`` is on (see :func:`npvp_tpu.core.mesh.tree_shardings`)."""
    rep = replicated(mesh)
    if state_shardings is None:
        state_shardings = rep

    def train_step(state: TrainState, batch) -> Tuple[TrainState, dict]:
        x = jnp.concatenate([batch["past"], batch["future"]], axis=1)

        def loss_fn(params):
            (rec, _), mutated = ae.apply(
                {"params": params, "batch_stats": state.batch_stats}, x,
                train=True, mutable=["batch_stats"])
            return l1_loss(rec, x), mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, new_stats)
        return state, {"L1_loss_train": loss}

    def eval_step(state: TrainState, batch) -> dict:
        x = jnp.concatenate([batch["past"], batch["future"]], axis=1)
        rec, _ = ae.apply(state.variables, x, train=False)
        return {"L1_loss_valid": l1_loss(rec, x)}

    def vis_step(state: TrainState, batch):
        x = jnp.concatenate([batch["past"], batch["future"]], axis=1)
        rec, _ = ae.apply(state.variables, x, train=False)
        return rec

    # -- multi-step dispatch: K optimizer steps per device program ------------
    # Same rationale as stage-2 (stage2_predictor.make_steps): on
    # high-dispatch-latency runtimes the per-step dispatch dominates the AE's
    # small step. The AE step draws no rng, so lax.scan over a stacked chunk
    # is bit-identical to the per-step loop (BN stats thread sequentially
    # through the scan carry).
    def train_multi(state: TrainState, batches):
        return jax.lax.scan(train_step, state, batches)

    def eval_multi(state: TrainState, batches):
        def body(carry, batch):
            return carry, eval_step(state, batch)
        _, ms = jax.lax.scan(body, 0, batches)
        return ms

    train_multi = jax.jit(train_multi, donate_argnums=0,
                          out_shardings=(state_shardings, rep))
    eval_multi = jax.jit(eval_multi, out_shardings=rep)
    train_step = jax.jit(train_step, donate_argnums=0,
                         out_shardings=(state_shardings, rep))
    eval_step = jax.jit(eval_step, out_shardings=rep)
    vis = jax.jit(vis_step)

    def place(batch):
        return shard_batch(mesh, batch)

    def place_stack(chunk):
        """Stack raw batches along a new leading K axis; the batch (second)
        axis shards over the data mesh axis."""
        if jax.process_count() > 1:
            placed = [shard_batch(mesh, b) for b in chunk]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *placed)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from npvp_tpu.core.mesh import DATA_AXIS

        stacked = {k: np.stack([b[k] for b in chunk]) for k in chunk[0]}
        return {k: jax.device_put(v, NamedSharding(mesh, P(None, DATA_AXIS)))
                for k, v in stacked.items()}

    def train_multi_placed(st, chunk):
        return train_multi(st, place_stack(chunk))

    def eval_multi_placed(st, chunk):
        return eval_multi(st, place_stack(chunk))

    return (lambda st, b: train_step(st, place(b)),
            lambda st, b: eval_step(st, place(b)),
            lambda st, b: vis(st, place(b)),
            train_multi_placed, eval_multi_placed)


def train(cfg: Config, max_steps: int | None = None) -> TrainState:
    mesh = setup(cfg)
    dtype = compute_dtype(cfg)
    ae = build_ae(cfg, dtype)
    dm = DataModule(cfg, jax.process_index(), jax.process_count())
    d = cfg.Dataset
    clip_len = d.num_past_frames + d.num_future_frames
    state = init_state(cfg, ae, (1, clip_len, d.img_size, d.img_size,
                                 d.img_channels))
    if is_main_process():
        print(f"AE parameters: {param_count(state.params) / 1e6:.2f}M")

    train_loader = dm.train_loader()
    val_loader = dm.val_loader()

    ckpt = CheckpointManager(cfg.AE.ckpt_save_dir, max_to_keep=5,
                             monitor="L1_loss_valid", mode="min")
    start_epoch = cfg.AE.start_epoch
    if cfg.AE.resume_ckpt:
        if str(cfg.AE.resume_ckpt).endswith(".npz"):
            # warm-start from a committed weights artifact (fresh moments)
            from npvp_tpu.tools.export_weights import warm_start_state

            state = warm_start_state(state, cfg.AE.resume_ckpt, which="ae")
        else:
            resume = CheckpointManager(cfg.AE.resume_ckpt)
            state = resume.restore(state)
        start_epoch = int(state.step) // max(1, dm.len_train_loader or 1)

    logger = MetricsLogger(cfg.AE.tensorboard_save_dir)
    # state (fresh or restored) must live on the mesh before the first step —
    # batches arrive as mesh-wide global arrays. Replicated by default;
    # ZeRO-3 data-axis sharding under Env.fsdp (the AE has no head-split
    # attention, so the TP rules are skipped).
    from npvp_tpu.core.mesh import tree_shardings

    state_sh = tree_shardings(mesh, state, fsdp=cfg.Env.fsdp, tp=False)
    state = jax.device_put(state, state_sh)
    (train_step, eval_step, vis_step,
     train_multi, eval_multi) = make_steps(ae, mesh, state_sh)
    cfg.save(f"{cfg.AE.ckpt_save_dir}/config.json")

    K = max(1, cfg.Env.steps_per_dispatch)
    step = int(state.step)
    for epoch in range(start_epoch, cfg.AE.epochs):
        train_loader.set_epoch(epoch)
        meters = AverageMeters()
        chunk = []
        for batch in train_loader:
            maybe_start_profiler(cfg, step)
            chunk.append(batch)
            step += 1
            if len(chunk) == K:
                if K == 1:
                    state, metrics = train_step(state, chunk[0])
                else:
                    state, metrics = train_multi(state, chunk)
                meters.update(metrics)
                chunk = []
            if max_steps is not None and step >= max_steps:
                break
        if chunk:
            state, metrics = (train_step(state, chunk[0]) if len(chunk) == 1
                              else train_multi(state, chunk))
            meters.update(metrics)

        val_meters = AverageMeters()
        vchunk = []
        for batch in val_loader:
            vchunk.append(batch)
            if len(vchunk) == K:
                val_meters.update(eval_step(state, vchunk[0]) if K == 1
                                  else eval_multi(state, vchunk))
                vchunk = []
        if vchunk:
            val_meters.update(eval_step(state, vchunk[0])
                              if len(vchunk) == 1
                              else eval_multi(state, vchunk))
        scalars = {**meters.averages(), **val_meters.averages()}
        logger.log_scalars(step, scalars)
        if is_main_process():
            print(f"epoch {epoch}: " + " ".join(
                f"{k}={v:.5f}" for k, v in scalars.items()))

        ckpt.save(step, state, metrics={"L1_loss_valid":
                                        scalars.get("L1_loss_valid", 0.0)})

        if (cfg.Env.visual_callback and is_main_process()
                and epoch % cfg.AE.log_per_epochs == 0):
            batch = next(iter(val_loader))
            rec = vis_step(state, batch)
            gt = np.concatenate([batch["past"], batch["future"]], axis=1)
            save_clip_gifs(
                f"{cfg.AE.tensorboard_save_dir}/epoch_{epoch}.gif",
                {"gt": gt[0], "rec": np.asarray(rec[0], np.float32)},
                renorm=dm.renorm)
        if max_steps is not None and step >= max_steps:
            break

    stop_profiler()
    ckpt.wait()
    logger.close()
    return state


def main(argv=None):
    args = build_argparser("NPVP-TPU stage-1 autoencoder training").parse_args(
        argv)
    cfg = load_cli_config(args)
    train(cfg, max_steps=20 if args.smoke else None)


if __name__ == "__main__":
    main(sys.argv[1:])
