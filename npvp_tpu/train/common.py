"""Shared trainer plumbing: CLI, seeding, mesh setup, logging."""

from __future__ import annotations

import argparse
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from npvp_tpu.core.config import Config, load_config
from npvp_tpu.core.mesh import make_mesh
from npvp_tpu.core.metrics import is_main_process


def build_argparser(description: str) -> argparse.ArgumentParser:
    """``--config_path`` mirrors the reference CLI
    (train_AutoEncoder_lightning.py:14-18); ``--override Group.key=value``
    adds the CLI override capability the reference lacks (survey §5.6)."""
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--override", nargs="*", default=[],
                        help="Group.key=value config overrides")
    parser.add_argument("--smoke", action="store_true",
                        help="tiny shapes / few steps, for CI smoke runs")
    return parser


def load_cli_config(args) -> Config:
    cfg = load_config(args.config_path, overrides=args.override)
    if args.smoke:
        cfg.Dataset.dev_set_size = 2 * cfg.Dataset.batch_size
        cfg.AE.epochs = 1
        cfg.Predictor.epochs = 1
    return cfg


def setup(cfg: Config):
    """Seed + mesh + logger. Multi-host init (jax.distributed) is performed
    by the launcher when JAX_PROCESS_COUNT is set; single-host otherwise."""
    np.random.seed(cfg.Env.rand_seed)
    mesh_axes = dict(cfg.Env.mesh_shape)
    mesh = make_mesh(data=mesh_axes.get("data", -1),
                     model=mesh_axes.get("model", 1),
                     batch_size=cfg.Dataset.batch_size)
    return mesh


def compute_dtype(cfg: Config):
    return jnp.bfloat16 if cfg.Env.compute_dtype == "bfloat16" else jnp.float32


def maybe_start_profiler(cfg: Config, step: int, start_step: int = 10,
                         num_steps: int = 5) -> Optional[str]:
    """jax.profiler trace around a few steady-state steps (survey §5.1)."""
    if cfg.Env.profile_dir is None or not is_main_process():
        return None
    if step == start_step:
        jax.profiler.start_trace(cfg.Env.profile_dir)
        return "started"
    if step == start_step + num_steps:
        jax.profiler.stop_trace()
        return "stopped"
    return None
