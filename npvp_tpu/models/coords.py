"""Continuous (t, h, w) coordinate grids.

Pure-function equivalent of the reference's ``CoorGenerator`` module
(reference models/submodules.py:329-366): coordinates are normalized to
[0, 1] by the maxima and laid out as a ``(T*H*W, 3)`` grid in (t, h, w)
order. Because these are pure jnp functions, arbitrary — including
fractional — time coordinate lists can be traced into a jitted program,
which is the continuous-time API behind VFP/VPE/VFI/VRC/HVRC (reference
models/Predictor.py:352-359 ``reset_pos_coor``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _check_bounds(name: str, values, max_value: float) -> None:
    """Reject coordinates outside [0, max] — the reference asserts the same
    bounds (models/submodules.py:349-351); out-of-range times fall outside
    the trained Fourier-feature range and silently degrade quality. Traced
    (abstract) values are skipped — in-program coordinates are produced by
    bounds-checked callers."""
    if isinstance(values, jax.core.Tracer):
        return
    vals = np.asarray(values)
    if vals.size and (vals.min() < 0.0 or vals.max() > max_value):
        raise ValueError(
            f"{name} coordinates must lie in [0, {max_value}]; got "
            f"[{vals.min()}, {vals.max()}]. Times beyond max_T must be "
            "evaluated with the sliding-window protocol "
            "(VideoPredictor.vfp handles this automatically).")


def coordinate_grid(
    t_list: jnp.ndarray,
    h_list: jnp.ndarray,
    w_list: jnp.ndarray,
    max_T: float,
    max_H: float,
    max_W: float,
) -> jnp.ndarray:
    """Build a normalized (t, h, w) coordinate grid.

    Args:
      t_list: (T,) time coordinates in [0, max_T] (may be fractional).
      h_list: (H,) row coordinates in [0, max_H].
      w_list: (W,) column coordinates in [0, max_W].
      max_T, max_H, max_W: normalization maxima.

    Returns:
      (T*H*W, 3) array; last dim ordered (t, h, w), all in [0, 1].
    """
    _check_bounds("t", t_list, max_T)
    _check_bounds("h", h_list, max_H)
    _check_bounds("w", w_list, max_W)
    t = jnp.asarray(t_list, jnp.float32) / max_T
    h = jnp.asarray(h_list, jnp.float32) / max_H
    w = jnp.asarray(w_list, jnp.float32) / max_W

    T, H, W = t.shape[0], h.shape[0], w.shape[0]
    tt = jnp.broadcast_to(t[:, None, None], (T, H, W))
    hh = jnp.broadcast_to(h[None, :, None], (T, H, W))
    ww = jnp.broadcast_to(w[None, None, :], (T, H, W))
    return jnp.stack([tt, hh, ww], axis=-1).reshape(T * H * W, 3)


def spatial_index_lists(max_H: int, max_W: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The full-resolution h/w index lists (reference models/Predictor.py:28-29)."""
    return (jnp.arange(max_H, dtype=jnp.float32),
            jnp.arange(max_W, dtype=jnp.float32))


def task_time_lists(
    task: str,
    num_past: int,
    num_future: int,
    context_p: int = 0,
    context_f: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Observed/target time index lists for the canonical tasks.

    VFP: observe [0, P), predict [P, P+F)           (future prediction)
    VPE: observe [F, F+P), predict [0, F)           (past extrapolation)
    VFI: observe ends, predict the middle           (interpolation;
         reference models/Predictor.py:30-37)
    """
    total = num_past + num_future
    idx = jnp.arange(total, dtype=jnp.float32)
    if task == "VFP":
        return idx[:num_past], idx[num_past:]
    if task == "VPE":
        return idx[num_future:], idx[:num_future]
    if task == "VFI":
        to = jnp.concatenate([idx[:context_p], idx[total - context_f:]])
        tp = idx[context_p: total - context_f]
        return to, tp
    raise ValueError(f"unknown task {task!r}; expected VFP | VPE | VFI")


def full_coordinate_volume(
    max_T: int, max_H: int, max_W: int
) -> jnp.ndarray:
    """(max_T, max_H, max_W, 3) volume of all integer coordinates, used by the
    unified / rand-context mode to gather per-batch observed/target subsets
    (reference models/Predictor.py:284)."""
    h, w = spatial_index_lists(max_H, max_W)
    t = jnp.arange(max_T, dtype=jnp.float32)
    flat = coordinate_grid(t, h, w, max_T, max_H, max_W)
    return flat.reshape(max_T, max_H, max_W, 3)
