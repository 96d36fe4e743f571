"""Metrics aggregation + observability.

Device-side: metric pytrees are plain jnp scalars computed inside the jitted
step (reduced over the global batch by jit's collectives — the cross-rank
meter averaging the reference does in Python, utils/train_summary.py:145-163,
is free here). Host-side: process-0-gated TensorBoard + JSONL writers
(equivalent of Lightning's ``self.log`` + TensorBoardLogger) and GIF
visualization of GT/recon/pred clips (reference utils/train_summary.py:22-80,
233-271).
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np


def is_main_process() -> bool:
    """Equivalent of rank_zero_only gating (reference
    utils/train_summary.py:23)."""
    return jax.process_index() == 0


class AverageMeters:
    """Running means keyed by name (reference utils/train_summary.py:113-143).
    Values may be jax scalars; conversion happens lazily at read time so the
    train loop never blocks on device→host transfers mid-epoch."""

    def __init__(self):
        self._sums: Dict[str, list] = defaultdict(list)

    def update(self, metrics: Dict[str, object]):
        for k, v in metrics.items():
            self._sums[k].append(v)

    def averages(self) -> Dict[str, float]:
        # entries may be scalars or (K,) per-step stacks from multi-step
        # dispatch — every step weighs equally either way
        return {k: float(np.mean(np.concatenate(
                    [np.atleast_1d(np.asarray(x, np.float32)) for x in v])))
                for k, v in self._sums.items()}

    def reset(self):
        self._sums.clear()


class MetricsLogger:
    """TensorBoard (when available) + JSONL scalar logger, main-process only."""

    def __init__(self, log_dir: str | Path, use_tensorboard: bool = True):
        self.log_dir = Path(log_dir)
        self._tb = None
        self._jsonl = None
        if not is_main_process():
            return
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(str(self.log_dir))
            except Exception:
                self._tb = None

    def log_scalars(self, step: int, metrics: Dict[str, float]):
        if self._jsonl is None:
            return
        record = {"step": int(step), "time": time.time(),
                  **{k: float(v) for k, v in metrics.items()}}
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), int(step))

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def save_clip_gifs(path: str | Path, clips: Dict[str, np.ndarray],
                   renorm=None, duration_ms: int = 125):
    """Write side-by-side animated GIFs of named clips, padding shorter clips
    by repeating their last frame (reference utils/train_summary.py:233-271).

    clips: name → (T, H, W, C) float array; renorm: optional fn mapping model
    output range back to [0, 1].
    """
    from PIL import Image

    arrays = []
    max_T = max(c.shape[0] for c in clips.values())
    for clip in clips.values():
        clip = np.asarray(clip, np.float32)
        if renorm is not None:
            clip = renorm(clip)
        clip = np.clip(clip, 0.0, 1.0)
        if clip.shape[0] < max_T:
            pad = np.repeat(clip[-1:], max_T - clip.shape[0], axis=0)
            clip = np.concatenate([clip, pad], axis=0)
        arrays.append(clip)
    strip = np.concatenate(arrays, axis=2)  # side by side on width
    if strip.shape[-1] == 1:
        strip = np.repeat(strip, 3, axis=-1)
    frames = [Image.fromarray((f * 255).astype(np.uint8)) for f in strip]
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    frames[0].save(str(path), save_all=True, append_images=frames[1:],
                   duration=duration_ms, loop=0)


class StepTimer:
    """Wall-clock per-step timing with jax.block_until_ready bracketing for
    honest steady-state numbers (survey §5.1 TPU tracing plan)."""

    def __init__(self):
        self.times: list = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        self.times.append(time.perf_counter() - self._t0)

    def summary(self, skip_first: int = 1) -> Dict[str, float]:
        ts = self.times[skip_first:] or self.times
        return {"mean_s": float(np.mean(ts)), "p50_s": float(np.median(ts)),
                "min_s": float(np.min(ts)), "steps": len(ts)}
