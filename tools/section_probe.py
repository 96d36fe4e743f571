"""Section-level timing of the flagship inference pipeline on one TPU chip.

Each section is ONE jitted program that loops the section on-device via
lax.scan (amortizing the 10-45 ms tunnel dispatch overhead). Params are
passed as arguments (NOT closed over — closures become HLO constants, which
both bloats the remote-compile payload and invites constant folding), and the
scan carry feeds the section output back into its input through a
non-foldable tanh term so XLA cannot eliminate the body.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, iters, label, reps=3):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    ms = best / iters * 1e3
    print(f"{label}: {ms:.2f} ms", flush=True)
    return ms


def main():
    from __graft_entry__ import _flagship_config
    from npvp_tpu.models.coords import coordinate_grid, spatial_index_lists
    from npvp_tpu.models.inference import VideoPredictor
    from npvp_tpu.nn.resnet_ae import FrameAutoEncoder

    exec_mode = sys.argv[1] if len(sys.argv) > 1 else "xla"
    cfg = _flagship_config()
    vp = VideoPredictor.from_random_init(cfg, dtype=jnp.bfloat16,
                                         exec_mode=exec_mode)
    p = cfg.Predictor
    h, w = spatial_index_lists(p.max_H, p.max_W)
    oc = coordinate_grid(jnp.arange(10, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    tc = coordinate_grid(jnp.arange(10, 20, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    batch = 64
    frames = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, 10, 64, 64, 1), dtype=np.float32), jnp.bfloat16)
    feats = jnp.asarray(np.random.default_rng(1).standard_normal(
        (batch, 10, 8, 8, 512), dtype=np.float32), jnp.bfloat16) * 0.1
    key = jax.random.key(0)
    iters = 8

    def looped(section):
        """section(variables, x) → y; loop x ← x·1 + tanh(mean(y))·1e-3."""
        def fn(variables, x):
            def body(c, _):
                y = section(variables, c)
                feedback = jnp.tanh(jnp.mean(y).astype(jnp.float32))
                return c + (feedback * 1e-3).astype(c.dtype), None
            return jax.lax.scan(body, x, None, length=iters)[0]
        return fn

    enc = lambda v, x: vp.ae.apply(v, x, train=False,
                                   method=FrameAutoEncoder.encode)
    timed(looped(enc), (vp.ae_vars, frames), iters, "AE encode x10F")

    dec = lambda v, f: vp.ae.apply(v, f, train=False,
                                   method=FrameAutoEncoder.decode)
    # decode maps feats→frames; feedback via mean works since carry is feats
    timed(looped(dec), (vp.ae_vars, feats), iters, "AE decode x10F")

    pred = lambda v, f: vp.predictor.apply(v, f, oc, tc, 10,
                                           rngs={"latent": key}).pred_features
    timed(looped(pred), (vp.predictor_vars, feats), iters, "predictor")

    def evt(v, f):
        def inner(mdl):
            op_beta, op_gamma = mdl.nrmlp(oc)
            mem, coding = mdl.event_coding(f, op_beta, op_gamma)
            return mem
        return vp.predictor.apply(v, rngs={"latent": key}, method=inner)

    timed(looped(evt), (vp.predictor_vars, feats), iters,
          "evt-former (4 enc layers + nrmlp)")


if __name__ == "__main__":
    main()
