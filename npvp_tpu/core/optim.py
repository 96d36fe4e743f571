"""Optimizers and schedules.

Reproduces the reference's exact training recipe (survey §7 hard-part 6):

- Stage 1 AE: Adam(lr=AE_lr, betas=(0.5, 0.999))
  (reference models/ResNetAutoEncoder.py:46-49).
- Stage 2 predictor: AdamW(lr=predictor_lr) with per-*batch* cosine warm
  restarts (T_mult=1, eta_min) stepped as epoch + batch/epoch_batches
  (reference models/Predictor.py:144-148, 196-218) and gradient clipping by
  global norm applied to the NAR-decoder ("transformer") subtree only
  (reference models/Predictor.py:135).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


def cosine_warm_restarts(base_lr: float, eta_min: float,
                         steps_per_cycle: int) -> optax.Schedule:
    """CosineAnnealingWarmRestarts with T_mult=1: lr restarts to base_lr every
    ``steps_per_cycle`` optimizer steps (= scheduler_T0 epochs ×
    steps-per-epoch when called from the trainer)."""
    def schedule(step):
        frac = (step % steps_per_cycle) / steps_per_cycle
        return eta_min + 0.5 * (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * frac))
    return schedule


def clip_subtree_by_global_norm(
    max_norm: float, predicate: Callable[[str], bool]
) -> optax.GradientTransformation:
    """Clip by global norm computed over — and applied to — only the params
    whose path satisfies ``predicate``; other grads pass through unchanged."""

    def path_str(path):
        return "/" + "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path)

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        flat = jax.tree_util.tree_flatten_with_path(updates)[0]
        selected = [leaf for path, leaf in flat if predicate(path_str(path))]
        if not selected:
            return updates, state
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                             for g in selected))
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-12))

        def apply(path, g):
            if predicate(path_str(path)):
                return (g.astype(jnp.float32) * scale).astype(g.dtype)
            return g

        return jax.tree_util.tree_map_with_path(apply, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_ae_optimizer(lr: float) -> optax.GradientTransformation:
    """Adam(β1=0.5, β2=0.999) — the pix2pix-style AE recipe."""
    return optax.adam(lr, b1=0.5, b2=0.999)


def make_predictor_optimizer(
    lr: float,
    max_grad_norm: float,
    use_cosine: bool,
    eta_min: float,
    steps_per_cycle: int,
    clip_predicate: Callable[[str], bool] = lambda p: "/decoder/" in p,
) -> optax.GradientTransformation:
    schedule = (cosine_warm_restarts(lr, eta_min, steps_per_cycle)
                if use_cosine else lr)
    return optax.chain(
        clip_subtree_by_global_norm(max_grad_norm, clip_predicate),
        optax.adamw(schedule, b1=0.9, b2=0.999, weight_decay=0.01),
    )


def noam_schedule(model_size: int, factor: float,
                  warmup_steps: int) -> optax.Schedule:
    """Attention-is-all-you-need warmup/decay schedule (reference's legacy
    NoamOpt, models/criterion.py:306-339). Being a pure function of the step,
    it resumes correctly at any batch size — unlike the reference's stateful
    wrapper (its resume warning at models/criterion.py:338)."""
    def schedule(step):
        s = jnp.maximum(step, 1).astype(jnp.float32)
        return factor * model_size ** -0.5 * jnp.minimum(
            s ** -0.5, s * warmup_steps ** -1.5)
    return schedule


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)
