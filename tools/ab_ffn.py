"""Interleaved A/B at the MlpDWBN region level: XLA composition vs the fused
Pallas kernel, flagship shapes (B=640 frames, 8x8x512, hidden 2048).

MEASURED (v5e, 40 pairs): median xla/pallas = 0.87 — the kernel loses.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20
PAIRS = 12  # override with argv[2]


def main():
    from npvp_tpu.kernels.mlp_dwbn import fused_mlp_dwbn
    from npvp_tpu.nn.vidhrformer import MlpDWBN

    global PAIRS
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    if len(sys.argv) > 2:
        PAIRS = int(sys.argv[2])
    B, H, W, C, Hd = 640, 8, 8, 512, 2048
    mod_x = MlpDWBN(hidden_features=Hd, out_features=C, dropout=0.0,
                    exec_mode="xla", dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.key(0), (1, B, H, W, C),
                          jnp.bfloat16) * 0.3
    variables = mod_x.init(jax.random.key(1), x)
    p = variables["params"]

    def pallas_apply(v, xx):
        q = v["params"]
        y = fused_mlp_dwbn(
            xx.reshape(B, H, W, C).astype(jnp.bfloat16),
            q["fc1"]["kernel"].reshape(C, Hd), q["fc1"]["bias"],
            q["norm1"]["scale"], q["norm1"]["bias"],
            q["dw3x3"]["kernel"].reshape(3, 3, Hd), q["dw3x3"]["bias"],
            q["norm2"]["scale"], q["norm2"]["bias"],
            q["fc2"]["kernel"].reshape(Hd, C), q["fc2"]["bias"],
            q["norm3"]["scale"], q["norm3"]["bias"],
            frames_per_block=F)
        return y.reshape(1, B, H, W, C)

    def scanned(apply_fn):
        @jax.jit
        def fn(v, x):
            def body(c, _):
                y = apply_fn(v, c)
                fb = jnp.tanh(jnp.mean(y).astype(jnp.float32))
                return c + (fb * 1e-3).astype(c.dtype), None
            return jax.lax.scan(body, x, None, length=ITERS)[0]
        return fn

    fa = scanned(lambda v, xx: mod_x.apply(v, xx))
    fb = scanned(pallas_apply)
    ya = np.asarray(fa(variables, x), np.float32)
    yb = np.asarray(fb(variables, x), np.float32)
    print(f"F={F}; scanned-output max diff xla vs pallas: "
          f"{np.abs(ya - yb).max():.4f}", flush=True)
    ratios = []
    for i in range(PAIRS):
        t0 = time.perf_counter(); np.asarray(fa(variables, x)).ravel()[:1]
        ta = (time.perf_counter() - t0) / ITERS
        t0 = time.perf_counter(); np.asarray(fb(variables, x)).ravel()[:1]
        tb = (time.perf_counter() - t0) / ITERS
        ratios.append(ta / tb)
        print(f"pair {i}: xla {ta * 1e3:.2f} ms  pallas {tb * 1e3:.2f} ms  "
              f"xla/pallas = {ta / tb:.3f}", flush=True)
    print(f"median xla/pallas: {np.median(ratios):.3f} "
          f"(>1 means the kernel wins)", flush=True)


if __name__ == "__main__":
    main()
