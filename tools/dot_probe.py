"""Microbenchmark: bf16 dot vs raw int8 dot vs dynamic-quant composition.

Shapes = the flagship model's matmuls (M = N_batch*T*H*W tokens).
Each measurement is a single jitted program run back-to-back (CLAUDE.md:
per-dispatch overhead through the tunnel is 10-45 ms, so each program loops
the op K times on-device via scan to amortize).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args, label, iters=50, reps=3):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # fence
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best / iters * 1e6:.1f} us/op", flush=True)
    return best / iters


def main():
    M, K, N = 40960, 512, 512
    iters = 50
    kx = jax.random.key(0)
    xb = jax.random.normal(kx, (M, K), jnp.bfloat16)
    wb = jax.random.normal(jax.random.fold_in(kx, 1), (K, N), jnp.bfloat16)
    xi = jnp.asarray(np.random.default_rng(0).integers(-127, 127, (M, K)),
                     jnp.int8)
    wi = jnp.asarray(np.random.default_rng(1).integers(-127, 127, (K, N)),
                     jnp.int8)
    xf = xb.astype(jnp.float32)
    wf = wb.astype(jnp.float32)

    def loop(op, x, w):
        def body(c, _):
            y = op(x, w, c)
            return c + 1, y[0, 0]
        def fn(x, w):
            return jax.lax.scan(body, jnp.zeros((), x.dtype if x.dtype != jnp.int8 else jnp.int32), None, length=iters)[1]
        return fn

    bf16_dot = lambda x, w, c: jnp.dot(x + c.astype(x.dtype), w,
                                       preferred_element_type=jnp.float32)
    int8_dot = lambda x, w, c: jax.lax.dot_general(
        x + c.astype(x.dtype), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    def dyn_quant_dot(x, w, c):
        from npvp_tpu.nn.quant import int8_contract
        return int8_contract(x + c.astype(x.dtype), w,
                             out_dtype=jnp.bfloat16)

    t_bf16 = bench(loop(bf16_dot, xb, wb), (xb, wb), f"bf16 dot {M}x{K}x{N}",
                   iters)
    t_int8 = bench(loop(int8_dot, xi, wi), (xi, wi), f"raw int8 dot", iters)
    t_dyn = bench(loop(dyn_quant_dot, xb, wb), (xb, wb),
                  "dynamic-quant int8 (XLA composition, bf16 in)", iters)
    print(f"raw int8 speedup: {t_bf16 / t_int8:.2f}x; "
          f"dyn-quant speedup: {t_bf16 / t_dyn:.2f}x", flush=True)

    # FFN shape
    M2, K2, N2 = 40960, 512, 2048
    xb2 = jax.random.normal(kx, (M2, K2), jnp.bfloat16)
    wb2 = jax.random.normal(kx, (K2, N2), jnp.bfloat16)
    xi2 = jnp.asarray(np.random.default_rng(0).integers(-127, 127, (M2, K2)),
                      jnp.int8)
    wi2 = jnp.asarray(np.random.default_rng(1).integers(-127, 127, (K2, N2)),
                      jnp.int8)
    t_bf16 = bench(loop(bf16_dot, xb2, wb2), (xb2, wb2),
                   f"bf16 dot {M2}x{K2}x{N2}", iters)
    t_int8 = bench(loop(int8_dot, xi2, wi2), (xi2, wi2), "raw int8 dot", iters)
    print(f"raw int8 speedup (FFN): {t_bf16 / t_int8:.2f}x", flush=True)


if __name__ == "__main__":
    main()
