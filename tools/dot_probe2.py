"""Clean matmul-rate probe.

CRITICAL lesson (round 2): any result slicing INSIDE the jit lets XLA reduce
the matmul to a sliver, and the measurement collapses to tunnel dispatch
overhead (~30-40 ms/call). Every op here feeds its FULL output into the scan
carry through a reduction, so nothing can be sliced or hoisted.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def rate(M, K, N, dtype=jnp.bfloat16, iters=30, reps=3, label=""):
    key = jax.random.key(0)
    x = jax.random.normal(key, (M, K), dtype)
    w = jax.random.normal(jax.random.fold_in(key, 1), (K, N), dtype)

    @jax.jit
    def fn(x, w):
        def body(c, _):
            y = jnp.dot(x * c, w, preferred_element_type=jnp.float32)
            # full-tensor reduction: forces the whole matmul
            return (jnp.sum(y) * 1e-20 + 1.0).astype(dtype), None
        return jax.lax.scan(body, jnp.asarray(1.0, dtype), None,
                            length=iters)[0]

    out = fn(x, w)
    np.asarray(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(x, w))
        best = min(best, time.perf_counter() - t0)
    us = best / iters * 1e6
    tf = 2 * M * K * N / (best / iters) / 1e12
    print(f"dot {M}x{K}x{N} {np.dtype(dtype).name}{label}: {us:.0f} us  "
          f"{tf:.1f} TF/s", flush=True)
    return best / iters


def rate_int8(M, K, N, iters=30, reps=3):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)

    @jax.jit
    def fn(x, w):
        def body(c, _):
            y = jax.lax.dot_general(x ^ c, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (jnp.sum(y) & 1).astype(jnp.int8), None
        return jax.lax.scan(body, jnp.asarray(0, jnp.int8), None,
                            length=iters)[0]

    np.asarray(fn(x, w))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(x, w))
        best = min(best, time.perf_counter() - t0)
    us = best / iters * 1e6
    tf = 2 * M * K * N / (best / iters) / 1e12
    print(f"dot {M}x{K}x{N} int8: {us:.0f} us  {tf:.1f} TF/s", flush=True)
    return best / iters


if __name__ == "__main__":
    t_b = rate(40960, 512, 512)
    t_i = rate_int8(40960, 512, 512)
    print(f"  int8/bf16 speedup @512: {t_b / t_i:.2f}x", flush=True)
    rate(40960, 512, 1024)
    rate(40960, 512, 1536)
    t_b = rate(40960, 512, 2048)
    t_i = rate_int8(40960, 512, 2048)
    print(f"  int8/bf16 speedup @2048: {t_b / t_i:.2f}x", flush=True)
    rate(40960, 2048, 512)
    rate(4096, 512, 512)
    rate(8192, 4096, 4096)
