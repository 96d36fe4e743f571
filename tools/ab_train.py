"""Interleaved A/B of the stage-2 train step (flagship shapes, batch 8),
isolating the round-2 training-path changes:

  A = current           (affine-fused attention, bf16-traffic norms)
  B = legacy norms      (affine-fused attention, fp32-materializing LN)
  C = affine off        (pre-fused attention,    bf16-traffic norms)
  D = round-1 config    (pre-fused attention,    fp32-materializing LN)

All variants share one parameter tree (tested equalities), so the steps chain
on the same donated state. One process, alternating rounds — the only
measurement form that survives the shared-TPU variance.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

ROUNDS = 6
INNER = 4


def main():
    from __graft_entry__ import _flagship_config
    import npvp_tpu.nn.layers as layers
    from npvp_tpu.core.mesh import make_mesh, shard_state
    from npvp_tpu.models.predictor import build_predictor
    from npvp_tpu.train.stage1_ae import build_ae
    from npvp_tpu.train.stage2_predictor import (init_predictor_state,
                                                 make_steps)

    cfg = _flagship_config()
    batch = cfg.Dataset.batch_size = 8
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    dtype = jnp.bfloat16
    ae = build_ae(cfg, dtype)
    d = cfg.Dataset
    ae_vars = ae.init(jax.random.key(0),
                      jnp.zeros((1, 2, d.img_size, d.img_size,
                                 d.img_channels)))
    state = init_predictor_state(cfg, build_predictor(cfg, dtype),
                                 steps_per_epoch=100)
    state = shard_state(mesh, state)

    T = cfg.Predictor.max_T
    rng_np = np.random.default_rng(0)
    variants = {}
    for name, affine, legacy in (("A:current", None, False),
                                 ("B:legacy-norms", None, True),
                                 ("C:affine-off", False, False),
                                 ("D:round1", False, True)):
        predictor = build_predictor(cfg, dtype)
        if affine is not None:
            predictor = predictor.clone(affine_posfuse=affine)
        layers.LEGACY_NORMS = legacy  # trace-time switch
        step, _, place, _, _ = make_steps(cfg, predictor, ae, ae_vars, mesh,
                                          mode="rand_context")
        data = place({
            "clip": rng_np.standard_normal(
                (batch, T, d.img_size, d.img_size, d.img_channels),
                np.float32),
            "obs_mask": np.arange(T) < 10,
            "tgt_mask": np.arange(T) >= 10,
        })
        key = jax.random.key(1)
        t0 = time.perf_counter()
        state, m = step(state, data, key)   # trace+compile under the flag
        np.asarray(m["loss"])
        print(f"{name}: compiled in {time.perf_counter() - t0:.0f}s",
              flush=True)
        variants[name] = (step, data)
    layers.LEGACY_NORMS = False

    times = {k: [] for k in variants}
    for r in range(ROUNDS):
        line = []
        for name, (step, data) in variants.items():
            key = jax.random.key(100 + r)
            t0 = time.perf_counter()
            for i in range(INNER):
                state, m = step(state, data, jax.random.fold_in(key, i))
            np.asarray(m["loss"])
            ms = (time.perf_counter() - t0) / INNER * 1e3
            times[name].append(ms)
            line.append(f"{name} {ms:.0f}ms")
        print(f"round {r}: " + "  ".join(line), flush=True)
    for name, ts in times.items():
        print(f"{name}: median {np.median(ts):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
