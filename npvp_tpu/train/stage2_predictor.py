"""Stage-2 trainer: the NP predictor over a frozen stage-1 autoencoder.

Functional rebuild of the reference stage-2 pipeline
(reference train_Predictor_lightning.py + models/Predictor.py:12-262):

- stage-1 AE restored and frozen **in eval mode** (BN running stats — the
  reference freezes with ``.eval()``, models/Predictor.py:24-25, and its
  quality depends on it; here the AE simply runs with
  ``use_running_average=True`` under ``stop_gradient``);
- loss = image-L1 + λ·feature-L1 (+ β·KL for NPVP-S), AdamW with per-batch
  cosine warm restarts, grad clip on the NAR-decoder subtree only;
- three modes: ``pairs`` (VFP), ``vfi`` (fixed interpolation split) and
  ``rand_context`` (unified model) — the latter trains with full-``max_T``
  masked batches so every split runs the same compiled program.

The whole step (frozen AE encode → predictor fwd/bwd → frozen AE decode →
losses → update) is ONE donated XLA program per mode.
"""

from __future__ import annotations

import sys
from types import SimpleNamespace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from npvp_tpu.core.checkpoint import CheckpointManager
from npvp_tpu.core.config import Config
from npvp_tpu.core.metrics import (AverageMeters, MetricsLogger,
                                   is_main_process, save_clip_gifs)
from npvp_tpu.core.mesh import replicated, shard_batch, shard_state
from npvp_tpu.core.optim import make_predictor_optimizer
from npvp_tpu.core.train_state import TrainState, param_count
from npvp_tpu.data.loader import DataModule
from npvp_tpu.models.coords import (coordinate_grid, full_coordinate_volume,
                                    spatial_index_lists, task_time_lists)
from npvp_tpu.models.predictor import NPPredictor, build_predictor
from npvp_tpu.nn.losses import kl_divergence, l1_loss
from npvp_tpu.nn.resnet_ae import FrameAutoEncoder
from npvp_tpu.train.common import (build_argparser, compute_dtype,
                                   maybe_start_profiler, stop_profiler,
                                   load_cli_config, setup)
from npvp_tpu.train.stage1_ae import build_ae, init_state as ae_init_state


def load_frozen_ae(cfg: Config, dtype) -> Tuple[FrameAutoEncoder, dict]:
    """Restore the stage-1 checkpoint and return (module, variables)
    (reference models/Predictor.py:18-25)."""
    ae = build_ae(cfg, dtype)
    d = cfg.Dataset
    clip_len = d.num_past_frames + d.num_future_frames
    template = ae_init_state(cfg, ae,
                             (1, clip_len, d.img_size, d.img_size,
                              d.img_channels))
    if str(cfg.Predictor.resume_AE_ckpt).endswith(".npz"):
        # committed weights artifact (npvp_tpu/tools/export_weights.py) —
        # the only stage-1 state that survives a filesystem wipe
        from npvp_tpu.tools.export_weights import warm_start_state

        restored = warm_start_state(template, cfg.Predictor.resume_AE_ckpt,
                                    which="ae")
    else:
        mngr = CheckpointManager(cfg.Predictor.resume_AE_ckpt)
        restored = mngr.restore(template)
    variables = {"params": restored.params,
                 "batch_stats": restored.batch_stats}
    return ae, jax.lax.stop_gradient(variables)


def build_coords(cfg: Config, test: bool = False):
    """Static observed/target coordinate grids for the configured task
    (reference models/Predictor.py:28-41)."""
    p, d = cfg.Predictor, cfg.Dataset
    h, w = spatial_index_lists(p.max_H, p.max_W)
    num_past = d.test_num_past_frames if test else d.num_past_frames
    num_future = d.test_num_future_frames if test else d.num_future_frames
    if p.VFI:
        to, tp = task_time_lists("VFI", num_past, num_future,
                                 p.context_num_p, p.context_num_f)
    else:
        to, tp = task_time_lists("VFP", num_past, num_future)
    oc = coordinate_grid(to, h, w, p.max_T, p.max_H, p.max_W)
    tc = coordinate_grid(tp, h, w, p.max_T, p.max_H, p.max_W)
    return oc, tc, len(to), len(tp)


def init_predictor_state(cfg: Config, predictor: NPPredictor,
                         steps_per_epoch: int) -> TrainState:
    p = cfg.Predictor
    feat_shape = (1, 2, p.max_H, p.max_W, p.embed_dim)
    oc = jnp.zeros((2 * p.max_H * p.max_W, 3))
    rngs = {"params": jax.random.key(cfg.Env.rand_seed),
            "latent": jax.random.key(1), "dropout": jax.random.key(2),
            "droppath": jax.random.key(3)}
    variables = predictor.init(rngs, jnp.zeros(feat_shape), oc, oc, 2,
                               target_feats_gt=jnp.zeros(feat_shape),
                               train=True)
    tx = make_predictor_optimizer(
        p.predictor_lr, p.max_grad_norm, p.use_cosine_scheduler,
        p.scheduler_eta_min, p.scheduler_T0 * max(1, steps_per_epoch))
    return TrainState.create(apply_fn=predictor.apply,
                             params=variables["params"],
                             batch_stats=variables.get("batch_stats", {}),
                             tx=tx)


def merge_det_init(det_params, sto_params):
    """Initialize a stochastic model from a deterministic checkpoint: copy
    every leaf that exists with the same shape (the reference's
    ``load_from_checkpoint(strict=False)`` path,
    train_Predictor_lightning.py:43-47)."""
    def merge(sto, det):
        if isinstance(sto, dict):
            return {k: merge(v, det[k]) if isinstance(det, dict) and k in det
                    else v for k, v in sto.items()}
        if det is not None and getattr(det, "shape", None) == sto.shape:
            return det
        return sto
    return merge(sto_params, det_params)


def make_steps(cfg: Config, predictor: NPPredictor, ae: FrameAutoEncoder,
               ae_vars: dict, mesh, mode: str):
    p = cfg.Predictor
    stochastic = p.stochastic

    def encode(frames):
        return jax.lax.stop_gradient(
            ae.apply(ae_vars, frames, train=False,
                     method=FrameAutoEncoder.encode))

    def decode(feats):
        return ae.apply(ae_vars, feats, train=False,
                        method=FrameAutoEncoder.decode)

    if mode == "rand_context":
        vol = full_coordinate_volume(p.max_T, p.max_H, p.max_W)
        all_coords = vol.reshape(-1, 3)

        def forward(params, batch_stats, batch, rng, train):
            clip_feats = encode(batch["clip"])
            rngs = {"latent": jax.random.fold_in(rng, 0),
                    "dropout": jax.random.fold_in(rng, 1),
                    "droppath": jax.random.fold_in(rng, 2)}
            out, mutated = predictor.apply(
                {"params": params, "batch_stats": batch_stats},
                clip_feats, all_coords, all_coords, p.max_T,
                target_feats_gt=clip_feats if stochastic else None,
                obs_mask=batch["obs_mask"], tgt_mask=batch["tgt_mask"],
                train=train, rngs=rngs, mutable=["batch_stats"])
            pred_frames = decode(out.pred_features)
            tgt_m = batch["tgt_mask"].astype(jnp.float32)
            img_l1 = l1_loss(pred_frames, batch["clip"], mask=tgt_m)
            pf_l1 = l1_loss(out.pred_features, clip_feats, lam=p.lam_PF_L1,
                            mask=tgt_m)
            kl = (kl_divergence(out.mu_o, out.logvar_o, out.mu_p,
                                out.logvar_p, p.KL_beta)
                  if stochastic else 0.0)
            loss = img_l1 + pf_l1 + kl
            metrics = {"loss": loss, "Image_L1": img_l1, "PF_L1": pf_l1}
            if stochastic:
                metrics["KL_loss"] = kl
            return loss, (metrics, mutated["batch_stats"])
    else:
        oc, tc, num_obs, num_tgt = build_coords(cfg)

        def forward(params, batch_stats, batch, rng, train):
            past_feats = encode(batch["past"])
            future_feats = encode(batch["future"])
            rngs = {"latent": jax.random.fold_in(rng, 0),
                    "dropout": jax.random.fold_in(rng, 1),
                    "droppath": jax.random.fold_in(rng, 2)}
            out, mutated = predictor.apply(
                {"params": params, "batch_stats": batch_stats},
                past_feats, oc, tc, num_tgt,
                target_feats_gt=future_feats if stochastic else None,
                train=train, rngs=rngs, mutable=["batch_stats"])
            pred_frames = decode(out.pred_features)
            img_l1 = l1_loss(pred_frames, batch["future"])
            pf_l1 = l1_loss(out.pred_features, future_feats,
                            lam=p.lam_PF_L1)
            kl = (kl_divergence(out.mu_o, out.logvar_o, out.mu_p,
                                out.logvar_p, p.KL_beta)
                  if stochastic else 0.0)
            loss = img_l1 + pf_l1 + kl
            metrics = {"loss": loss, "Image_L1": img_l1, "PF_L1": pf_l1}
            if stochastic:
                metrics["KL_loss"] = kl
            return loss, (metrics, mutated["batch_stats"])

    def _train_one(state: TrainState, batch, rng):
        grad_fn = jax.value_and_grad(forward, has_aux=True)
        (_, (metrics, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng, True)
        state = state.apply_gradients(grads, new_stats)
        return state, metrics

    def train_step(state: TrainState, batch, rng):
        return _train_one(state, batch, rng)

    def eval_step(state: TrainState, batch, rng):
        _, (metrics, _) = forward(state.params, state.batch_stats, batch,
                                  rng, False)
        return {k + "_val": v for k, v in metrics.items()}

    # -- multi-step dispatch: K gradient steps per device program ------------
    # On high-dispatch-latency runtimes (the tunneled TPU pays 10-1000 ms per
    # program dispatch) per-step dispatch dominates wall-clock. lax.scan over
    # a stacked chunk of K batches runs K optimizer steps in ONE program;
    # per-step rng is fold_in(base_rng, state.step) — the same stream the
    # per-step loop uses, so the two paths are bit-identical.
    def train_multi(state: TrainState, batches, base_rng):
        def body(st, batch):
            st, m = _train_one(st, batch,
                               jax.random.fold_in(base_rng, st.step))
            return st, m
        return jax.lax.scan(body, state, batches)

    def eval_multi(state: TrainState, batches, base_rng, i0):
        def body(i, batch):
            m = eval_step(state, batch, jax.random.fold_in(base_rng, i))
            return i + 1, m
        _, ms = jax.lax.scan(body, jnp.asarray(i0, jnp.int32), batches)
        return ms

    train_step = jax.jit(train_step, donate_argnums=0)
    eval_step_j = jax.jit(eval_step)
    train_multi = jax.jit(train_multi, donate_argnums=0)
    eval_multi = jax.jit(eval_multi)

    def place(batch):
        # single-host: device_put over the data axis; multi-host: global
        # array assembly from process-local shards (masks replicated)
        return shard_batch(mesh, batch)

    def place_stack(chunk):
        """Stack a list of raw batches along a new leading K axis and place
        with the *second* axis over the data mesh (masks replicated)."""
        if jax.process_count() > 1:
            placed = [shard_batch(mesh, b) for b in chunk]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *placed)
        stacked = {k: np.stack([b[k] for b in chunk]) for k in chunk[0]}
        from jax.sharding import NamedSharding, PartitionSpec as P

        from npvp_tpu.core.mesh import DATA_AXIS

        def put(name, leaf):
            if name.endswith("_mask") or np.ndim(leaf) <= 2:
                return jax.device_put(leaf, NamedSharding(mesh, P()))
            return jax.device_put(
                leaf, NamedSharding(mesh, P(None, DATA_AXIS)))

        return {k: put(k, v) for k, v in stacked.items()}

    multi = SimpleNamespace(train=train_multi, eval=eval_multi,
                            place_stack=place_stack)
    return train_step, eval_step_j, place, decode, encode, multi


def make_gan_steps(cfg: Config, predictor: NPPredictor, ae: FrameAutoEncoder,
                   ae_vars: dict, mesh, mode: str):
    """Adversarial stage-2 training (reference training_step_gan,
    models/Predictor.py:88-122 — deprecated upstream, provided for parity):
    PatchGAN discriminator on individual frames; D updates on
    stop-gradient'd predictions, G adds λ_gan·BCE to the NP losses. Both
    updates are one jitted program."""
    from npvp_tpu.nn.discriminator import PatchDiscriminator, gan_loss

    p = cfg.Predictor
    base_train, base_eval, place, decode, encode, _ = make_steps(
        cfg, predictor, ae, ae_vars, mesh, mode)
    # shrink the PatchGAN depth for small frames (each stride-2 layer
    # halves the map; 4x4 convs need >=2px inputs)
    import math

    max_layers = max(1, int(math.log2(cfg.Dataset.img_size)) - 3)
    disc = PatchDiscriminator(ndf=p.ndf, n_layers=min(3, max_layers))

    def pred_frames_fn(params, batch_stats, batch, rng, train):
        rngs = {"latent": jax.random.fold_in(rng, 0),
                "dropout": jax.random.fold_in(rng, 1),
                "droppath": jax.random.fold_in(rng, 2)}
        if mode == "rand_context":
            clip_feats = encode(batch["clip"])
            out, mutated = predictor.apply(
                {"params": params, "batch_stats": batch_stats},
                clip_feats, *_rand_ctx_coords(cfg), p.max_T,
                target_feats_gt=clip_feats if p.stochastic else None,
                obs_mask=batch["obs_mask"], tgt_mask=batch["tgt_mask"],
                train=train, rngs=rngs, mutable=["batch_stats"])
            real = batch["clip"]
        else:
            oc, tc, _, num_tgt = build_coords(cfg)
            past_feats = encode(batch["past"])
            future_feats = encode(batch["future"])
            out, mutated = predictor.apply(
                {"params": params, "batch_stats": batch_stats},
                past_feats, oc, tc, num_tgt,
                target_feats_gt=future_feats if p.stochastic else None,
                train=train, rngs=rngs, mutable=["batch_stats"])
            real = batch["future"]
        return decode(out.pred_features), real, mutated["batch_stats"]

    def train_step(state_g: TrainState, state_d: TrainState, batch, rng):
        # --- discriminator update (on frames, time folded into batch)
        fake, real, _ = pred_frames_fn(state_g.params, state_g.batch_stats,
                                       batch, rng, True)
        fake = jax.lax.stop_gradient(fake)
        flat = lambda x: x.reshape((-1,) + x.shape[2:])

        def d_loss_fn(d_params):
            logits_fake, md = disc.apply(
                {"params": d_params, "batch_stats": state_d.batch_stats},
                flat(fake), train=True, mutable=["batch_stats"])
            logits_real, md = disc.apply(
                {"params": d_params, "batch_stats": md["batch_stats"]},
                flat(real), train=True, mutable=["batch_stats"])
            loss_fake = gan_loss(logits_fake, False, lam=p.lam_gan)
            loss_real = gan_loss(logits_real, True, lam=p.lam_gan)
            return loss_fake + loss_real, (loss_fake, loss_real,
                                           md["batch_stats"])

        (loss_d, (loss_d_fake, loss_d_real, d_stats)), d_grads = \
            jax.value_and_grad(d_loss_fn, has_aux=True)(state_d.params)
        state_d = state_d.apply_gradients(d_grads, d_stats)

        # --- generator update: NP losses + adversarial term (one forward)
        def g_loss_fn(g_params):
            rngs = {"latent": jax.random.fold_in(rng, 0),
                    "dropout": jax.random.fold_in(rng, 1),
                    "droppath": jax.random.fold_in(rng, 2)}
            if mode == "rand_context":
                clip_feats = encode(batch["clip"])
                out, mutated = predictor.apply(
                    {"params": g_params, "batch_stats": state_g.batch_stats},
                    clip_feats, *_rand_ctx_coords(cfg), p.max_T,
                    target_feats_gt=clip_feats if p.stochastic else None,
                    obs_mask=batch["obs_mask"], tgt_mask=batch["tgt_mask"],
                    train=True, rngs=rngs, mutable=["batch_stats"])
                target_frames, target_feats = batch["clip"], clip_feats
                tgt_m = batch["tgt_mask"].astype(jnp.float32)
            else:
                oc, tc, _, num_tgt = build_coords(cfg)
                past_feats = encode(batch["past"])
                target_feats = encode(batch["future"])
                out, mutated = predictor.apply(
                    {"params": g_params, "batch_stats": state_g.batch_stats},
                    past_feats, oc, tc, num_tgt,
                    target_feats_gt=target_feats if p.stochastic else None,
                    train=True, rngs=rngs, mutable=["batch_stats"])
                target_frames, tgt_m = batch["future"], None
            frames = decode(out.pred_features)
            img_l1 = l1_loss(frames, target_frames, mask=tgt_m)
            pf_l1 = l1_loss(out.pred_features, target_feats,
                            lam=p.lam_PF_L1, mask=tgt_m)
            kl = (kl_divergence(out.mu_o, out.logvar_o, out.mu_p,
                                out.logvar_p, p.KL_beta)
                  if p.stochastic else 0.0)
            logits = disc.apply(
                {"params": state_d.params,
                 "batch_stats": state_d.batch_stats}, flat(frames),
                train=False)
            adv = gan_loss(logits, True, lam=p.lam_gan)
            loss = img_l1 + pf_l1 + kl + adv
            metrics = {"loss": loss, "Image_L1": img_l1, "PF_L1": pf_l1,
                       "loss_G_gan": adv, "loss_D": loss_d,
                       "loss_D_fake": loss_d_fake,
                       "loss_D_real": loss_d_real}
            if p.stochastic:
                metrics["KL_loss"] = kl
            return loss, (metrics, mutated["batch_stats"])

        (_, (metrics, g_stats)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state_g.params)
        state_g = state_g.apply_gradients(g_grads, g_stats)
        return state_g, state_d, metrics

    def init_discriminator(rng_key):
        d = cfg.Dataset
        dummy = jnp.zeros((1, d.img_size, d.img_size, d.img_channels))
        variables = disc.init(rng_key, dummy)
        tx = make_predictor_optimizer(
            p.predictor_lr, p.max_grad_norm, p.use_cosine_scheduler,
            p.scheduler_eta_min, p.scheduler_T0,
            clip_predicate=lambda path: False)
        return TrainState.create(apply_fn=disc.apply,
                                 params=variables["params"],
                                 batch_stats=variables.get("batch_stats", {}),
                                 tx=tx)

    return (jax.jit(train_step, donate_argnums=(0, 1)), base_eval, place,
            init_discriminator)


def _rand_ctx_coords(cfg: Config):
    p = cfg.Predictor
    all_coords = full_coordinate_volume(p.max_T, p.max_H,
                                        p.max_W).reshape(-1, 3)
    return all_coords, all_coords


def train(cfg: Config, max_steps: Optional[int] = None) -> TrainState:
    mesh = setup(cfg)
    dtype = compute_dtype(cfg)
    ae, ae_vars = load_frozen_ae(cfg, dtype)
    # the restored AE variables must live replicated on the mesh before the
    # first step — batches arrive as mesh-wide global arrays
    ae_vars = jax.device_put(ae_vars, replicated(mesh))
    predictor = build_predictor(cfg, dtype)
    dm = DataModule(cfg, jax.process_index(), jax.process_count())
    mode = dm.predictor_mode()
    train_loader = dm.train_loader(mode)
    val_loader = dm.val_loader(mode)

    state = init_predictor_state(cfg, predictor, dm.len_train_loader or 1)
    if cfg.Predictor.init_det_ckpt_for_vae:
        det_src = str(cfg.Predictor.init_det_ckpt_for_vae)
        if det_src.endswith(".npz"):
            # D→S init from a committed weights artifact: shapes differ
            # where stochastic-only, so take the raw tree and merge
            from npvp_tpu.tools.export_weights import load_weights

            _, det_pred, _ = load_weights(det_src)
            det_params = jax.tree.map(jnp.asarray, det_pred["params"])
        else:
            det = CheckpointManager(det_src).restore(state)
            det_params = det.params  # shapes differ where stochastic-only
        state = state.replace(
            params=merge_det_init(det_params, state.params))
    state = shard_state(mesh, state, fsdp=cfg.Env.fsdp)

    if is_main_process():
        print(f"Predictor parameters: {param_count(state.params) / 1e6:.2f}M"
              f" | mode={mode}")

    ckpt = CheckpointManager(cfg.Predictor.ckpt_save_dir,
                             max_to_keep=(cfg.Predictor.ckpt_max_keep
                                          or cfg.Predictor.epochs),
                             monitor="loss_val", mode="min")
    start_epoch = cfg.Predictor.start_epoch
    if cfg.Predictor.resume_ckpt:
        if str(cfg.Predictor.resume_ckpt).endswith(".npz"):
            # warm-start from a committed weights artifact: params +
            # batch_stats + step, fresh optimizer moments (the artifact
            # omits them by design — see tools/export_weights.py)
            from npvp_tpu.tools.export_weights import warm_start_state

            state = warm_start_state(state, cfg.Predictor.resume_ckpt,
                                     which="pred")
        else:
            state = CheckpointManager(
                cfg.Predictor.resume_ckpt).restore(state)
        start_epoch = int(state.step) // max(1, dm.len_train_loader or 1)
        # restored arrays → mesh layout
        state = shard_state(mesh, state, fsdp=cfg.Env.fsdp)

    logger = MetricsLogger(cfg.Predictor.tensorboard_save_dir)
    train_step, eval_step, place, decode, encode, multi = make_steps(
        cfg, predictor, ae, ae_vars, mesh, mode)
    cfg.save(f"{cfg.Predictor.ckpt_save_dir}/config.json")

    K = max(1, cfg.Env.steps_per_dispatch)
    base_rng = jax.random.key(cfg.Env.rand_seed)
    step = int(state.step)
    vis_memo = {}  # jitted visual-callback program, compiled once

    def flush_train(state, chunk, meters, start_step):
        """Dispatch a chunk of batches: one program for len(chunk) steps.
        The per-step rng is fold_in(base_rng, step) on BOTH paths, so
        chunking does not change the training stream. ``start_step`` is the
        host-side mirror of ``state.step`` at the chunk's first batch —
        reading ``int(state.step)`` here would block on the in-flight
        previous dispatch and serialize the loop."""
        if len(chunk) == 1:
            state, metrics = train_step(
                state, place(chunk[0]),
                jax.random.fold_in(base_rng, start_step))
        else:
            state, metrics = multi.train(state, multi.place_stack(chunk),
                                         base_rng)
        meters.update(metrics)
        return state

    for epoch in range(start_epoch, cfg.Predictor.epochs):
        train_loader.set_epoch(epoch)
        meters = AverageMeters()
        chunk = []
        for batch in train_loader:
            maybe_start_profiler(cfg, step)
            chunk.append(batch)
            step += 1
            if len(chunk) == K:
                state = flush_train(state, chunk, meters, step - len(chunk))
                chunk = []
            if max_steps is not None and step >= max_steps:
                break
        if chunk:
            state = flush_train(state, chunk, meters, step - len(chunk))

        val_meters = AverageMeters()
        val_rng = jax.random.fold_in(base_rng, 10 ** 9 + epoch)
        vchunk, vi = [], 0
        for batch in val_loader:
            if K == 1:
                # evaluate inline — buffering the whole val split in host
                # RAM is exactly what the streaming eval path avoids
                val_meters.update(eval_step(state, place(batch),
                                            jax.random.fold_in(val_rng, vi)))
                vi += 1
                continue
            vchunk.append(batch)
            if len(vchunk) == K:
                val_meters.update(multi.eval(
                    state, multi.place_stack(vchunk), val_rng, vi))
                vi += K
                vchunk = []
        for batch in vchunk:
            val_meters.update(eval_step(state, place(batch),
                                        jax.random.fold_in(val_rng, vi)))
            vi += 1
        scalars = {**{k + "_train": v for k, v in meters.averages().items()},
                   **val_meters.averages()}
        logger.log_scalars(step, scalars)
        if is_main_process():
            print(f"epoch {epoch}: " + " ".join(
                f"{k}={v:.5f}" for k, v in scalars.items()))
        stopped = max_steps is not None and step >= max_steps
        if (epoch % max(1, cfg.Predictor.ckpt_per_epochs) == 0
                or epoch == cfg.Predictor.epochs - 1 or stopped):
            # `stopped` (max_steps break) must persist the final state even
            # on a ckpt_per_epochs-unaligned epoch
            ckpt.save(step, state,
                      metrics={"loss_val": scalars.get("loss_val", 0.0)})

        # GT / prediction GIF triptych (reference VisCallbackPredictor,
        # utils/train_summary.py:49-80), main process only
        if (cfg.Env.visual_callback and is_main_process()
                and epoch % cfg.Predictor.log_per_epochs == 0):
            try:
                batch = next(iter(val_loader))
                _visual_callback(cfg, predictor, state, ae, ae_vars, batch,
                                 mode, dm, epoch, memo=vis_memo)
            except Exception as exc:  # visualization must never kill a run
                print(f"visual callback failed: {exc}")
        if max_steps is not None and step >= max_steps:
            break

    stop_profiler()
    ckpt.wait()
    logger.close()
    return state


def _visual_callback(cfg, predictor, state, ae, ae_vars, batch, mode, dm,
                     epoch, memo=None):
    """GT/prediction GIF. The frames→frames program is jitted ONCE and cached
    in ``memo`` across epochs — an eager predictor.apply here would execute
    thousands of primitives op-by-op, which on a tunneled runtime costs
    minutes per callback."""
    p = cfg.Predictor
    memo = memo if memo is not None else {}
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if mode == "rand_context":
        if "fn" not in memo:
            coords = full_coordinate_volume(p.max_T, p.max_H,
                                            p.max_W).reshape(-1, 3)

            @jax.jit
            def fn(variables, ae_vars, clip, om, tm, key):
                feats = ae.apply(ae_vars, clip, train=False,
                                 method=FrameAutoEncoder.encode)
                out = predictor.apply(variables, feats, coords, coords,
                                      p.max_T, obs_mask=om, tgt_mask=tm,
                                      rngs={"latent": key})
                return ae.apply(ae_vars, out.pred_features, train=False,
                                method=FrameAutoEncoder.decode)

            memo["fn"] = fn
        pred = memo["fn"](variables, ae_vars, jnp.asarray(batch["clip"]),
                          jnp.asarray(batch["obs_mask"]),
                          jnp.asarray(batch["tgt_mask"]),
                          jax.random.key(epoch))
        gt = batch["clip"][0]
    else:
        if "fn" not in memo:
            oc, tc, _, num_tgt = build_coords(cfg)

            @jax.jit
            def fn(variables, ae_vars, past, key):
                feats = ae.apply(ae_vars, past, train=False,
                                 method=FrameAutoEncoder.encode)
                out = predictor.apply(variables, feats, oc, tc, num_tgt,
                                      rngs={"latent": key})
                return ae.apply(ae_vars, out.pred_features, train=False,
                                method=FrameAutoEncoder.decode)

            memo["fn"] = fn
        pred = memo["fn"](variables, ae_vars, jnp.asarray(batch["past"]),
                          jax.random.key(epoch))
        gt = np.concatenate([batch["past"][0], batch["future"][0]], axis=0)
    pred = np.asarray(pred[0], np.float32)
    save_clip_gifs(
        f"{cfg.Predictor.tensorboard_save_dir}/epoch_{epoch}.gif",
        {"gt": gt, "pred": pred}, renorm=dm.renorm)


def main(argv=None):
    args = build_argparser("NPVP-TPU stage-2 predictor training").parse_args(
        argv)
    cfg = load_cli_config(args)
    train(cfg, max_steps=10 if args.smoke else None)


if __name__ == "__main__":
    main(sys.argv[1:])
