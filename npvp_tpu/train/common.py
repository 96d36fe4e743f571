"""Shared trainer plumbing: CLI, seeding, mesh setup, logging."""

from __future__ import annotations

import argparse
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from npvp_tpu.core.config import Config, load_config
from npvp_tpu.core.mesh import enable_sequence_parallel, make_mesh
from npvp_tpu.core.metrics import is_main_process


def build_argparser(description: str) -> argparse.ArgumentParser:
    """``--config_path`` mirrors the reference CLI
    (train_AutoEncoder_lightning.py:14-18); ``--override Group.key=value``
    adds the CLI override capability the reference lacks (survey §5.6)."""
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--override", nargs="*", default=[],
                        action="extend",
                        help="Group.key=value config overrides; the flag "
                             "may repeat and the lists accumulate (so a "
                             "supervisor can append a resume override "
                             "without clobbering the user's)")
    parser.add_argument("--smoke", action="store_true",
                        help="tiny shapes / few steps, for CI smoke runs")
    return parser


def load_cli_config(args) -> Config:
    cfg = load_config(args.config_path, overrides=args.override)
    if cfg.Env.platform:
        # honored here (not only setup()) so checkpoint-consuming CLIs
        # (eval/inference/tools) respect --override Env.platform=cpu too
        jax.config.update("jax_platforms", cfg.Env.platform)
    if args.smoke:
        cfg.Dataset.dev_set_size = 2 * cfg.Dataset.batch_size
        cfg.AE.epochs = 1
        cfg.Predictor.epochs = 1
    return cfg


def setup(cfg: Config):
    """Seed + debug mode + multi-host init + mesh.

    Multi-host: when coordinator env vars are present (``JAX_COORDINATOR``/
    ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``, or a managed environment that
    jax.distributed auto-detects), ``jax.distributed.initialize()`` joins the
    process group before any backend use — the equivalent of Lightning's DDP
    process-group init (reference train_AutoEncoder_lightning.py:40-42).
    Single-host otherwise.
    """
    if cfg.Env.platform:
        jax.config.update("jax_platforms", cfg.Env.platform)
    if cfg.Env.debug_nans:
        # survey §5.2 sanitizer equivalent: re-runs the offending primitive
        # un-jitted and raises at the first NaN-producing op
        jax.config.update("jax_debug_nans", True)
    maybe_init_distributed()
    np.random.seed(cfg.Env.rand_seed)
    mesh_axes = dict(cfg.Env.mesh_shape)
    mesh = make_mesh(data=mesh_axes.get("data", -1),
                     model=mesh_axes.get("model", 1),
                     batch_size=cfg.Dataset.batch_size)
    if cfg.Env.sequence_parallel:
        # spatial-H activation sharding over the model axis (survey §2.5
        # "shard N·H·W"); trace-time — must be enabled before the first jit
        enable_sequence_parallel(mesh)
    return mesh


_DISTRIBUTED_INITIALIZED = False


def maybe_init_distributed() -> bool:
    """Join the multi-process group when launched by a multi-host launcher.

    Launch procedure (one process per host, e.g. one per TPU VM worker):

        JAX_COORDINATOR=host0:8476 JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=$i \\
            python -m npvp_tpu.train.stage2_predictor --config_path ...

    On Cloud TPU pods the three variables are auto-detected and only
    ``JAX_USE_DISTRIBUTED=1`` is needed. Safe to call more than once.

    Must run before ANY backend-initializing jax call (even
    ``jax.process_count()`` initializes the XLA backend, after which
    ``jax.distributed.initialize`` raises) — so the guard here is a module
    flag plus the env vars, never a jax query.
    """
    import os

    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return True
    coordinator = os.environ.get("JAX_COORDINATOR")
    explicit = os.environ.get("JAX_USE_DISTRIBUTED") == "1"
    if not coordinator and not explicit:
        return False
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]))
    else:
        jax.distributed.initialize()  # auto-detected managed environment
    _DISTRIBUTED_INITIALIZED = True
    return True


def compute_dtype(cfg: Config):
    return jnp.bfloat16 if cfg.Env.compute_dtype == "bfloat16" else jnp.float32


_PROFILER_ACTIVE = False


def maybe_start_profiler(cfg: Config, step: int, start_step: int = 10,
                         num_steps: int = 5) -> Optional[str]:
    """jax.profiler trace around a few steady-state steps (survey §5.1).

    Called once per train step by both trainers; a trace is opened at
    ``start_step`` and closed ``num_steps`` later (or by
    :func:`stop_profiler`, which the trainers call at teardown as a
    backstop for short runs)."""
    global _PROFILER_ACTIVE
    if cfg.Env.profile_dir is None or not is_main_process():
        return None
    if step == start_step and not _PROFILER_ACTIVE:
        jax.profiler.start_trace(cfg.Env.profile_dir)
        _PROFILER_ACTIVE = True
        return "started"
    if step == start_step + num_steps and _PROFILER_ACTIVE:
        jax.profiler.stop_trace()
        _PROFILER_ACTIVE = False
        return "stopped"
    return None


def stop_profiler() -> None:
    """Close a still-open profiler trace (runs shorter than
    start_step + num_steps)."""
    global _PROFILER_ACTIVE
    if _PROFILER_ACTIVE:
        jax.profiler.stop_trace()
        _PROFILER_ACTIVE = False
