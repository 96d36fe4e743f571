"""Interleaved A/B of the stage-2 train step (flagship shapes, batch 8),
isolating the round-2 training-path changes:

  A = current           (bf16-traffic norms; affine gated off under grad)
  B = legacy norms      (fp32-materializing *token* LayerNorms)
  D = round-1 config    (affine off + fp32-materializing token LayerNorms)

LEGACY_NORMS only switches TokenLayerNorm (the transformer-block norms —
the dominant norm traffic); LayerNormHWC and the custom BatchNorm keep
their bf16-traffic form in every variant, so B/D bound the token-norm
effect only, not the full round-1 norm behavior.

(The historical variant C — affine-fused attention differentiated — can no
longer be constructed: the deterministic gate in the blocks decides per
call. Its measurement is recorded below.)

All variants share one parameter tree (tested equalities), so the steps chain
on the same donated state. One process, alternating rounds — the only
measurement form that survives the shared-TPU variance. The harness
(config/state/batch) comes from bench.flagship_train_fixture so this probe
cannot drift from the benchmark it explains.

Measured 2026-08-16 (medians over 6 rounds): affine-in-backward +10.7%
(254.7 vs 230.1 ms) → affine path now gated to non-differentiated calls;
legacy vs bf16-traffic norms within noise (253.5 vs 254.7 ms).
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
    from bench import flagship_train_fixture
    import npvp_tpu.nn.layers as layers
    from npvp_tpu.models.predictor import build_predictor
    from npvp_tpu.train.stage2_predictor import make_steps

    cfg, mesh, ae, ae_vars, state, raw_batch = flagship_train_fixture()
    dtype = jnp.bfloat16

    variants = {}
    for name, affine, legacy in (("A:current", None, False),
                                 ("B:legacy-norms", None, True),
                                 ("D:round1", False, True)):
        predictor = build_predictor(cfg, dtype)
        if affine is not None:
            predictor = predictor.clone(affine_posfuse=affine)
        layers.LEGACY_NORMS = legacy  # trace-time switch
        step, _, place, _, _, _ = make_steps(cfg, predictor, ae, ae_vars, mesh,
                                          mode="rand_context")
        data = place(raw_batch)
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
