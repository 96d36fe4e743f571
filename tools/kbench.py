"""Kernel-level interleaved A/B of temporal-attention variants on the TPU.

The floor dossier (tools/floor_dossier.py) shows the Pallas custom-calls
running at ~24% of their speed-of-light bound — latency-bound on tiny
per-head batched dots, not bandwidth. Variants measured here at the
flagship cross/temporal-attention shape (B=4096 sites, T=20, 8 heads × 64):

  base       in-kernel head loop, block_sites=64   (shipping config)
  oproj      output projection fused, per-head K=hd dots

Measured-and-removed variants (2026-08-17, this chip): site blocks >64
exceed the 16 MB scoped-VMEM limit (compile failure); a head-axis-on-grid
variant is rejected by Mosaic (last block dim must divide 128; hd = 64);
projecting from a VMEM context scratch with one full-K dot was a wash
(3.61 vs 3.55 ms median) — the kernel is latency-bound on the attention
structure itself, not on the projection dots.

Methodology per CLAUDE.md: each timed sample runs ITERS calls chained
through a lax.scan carry (full-tensor reduction feeds the next call — no
in-jit slicing), variants alternate within one process, medians over PAIRS
rounds.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from npvp_tpu.kernels.temporal_attention import temporal_attention

ITERS = 20
PAIRS = 5
B, T, NH, HD, C = 4096, 20, 8, 512, 512


def make_fn(**kw):
    @jax.jit
    def fn(q, k, v):
        def body(c, _):
            out = temporal_attention(q + c, k, v, num_heads=NH, **kw)
            fb = (jnp.mean(out.astype(jnp.float32)) * 1e-6).astype(q.dtype)
            return c + fb, None
        return jax.lax.scan(body, jnp.zeros((), q.dtype), None,
                            length=ITERS)[0]
    return fn


def main():
    rng = np.random.default_rng(0)
    mk = lambda t: jnp.asarray(
        rng.standard_normal((B, t, HD), dtype=np.float32), jnp.bfloat16)
    q, k, v = mk(T), mk(T), mk(T)
    wo = jnp.asarray(rng.standard_normal((HD, C), dtype=np.float32) * 0.05,
                     jnp.bfloat16)
    bo = jnp.asarray(rng.standard_normal((C,), dtype=np.float32))

    variants = {
        # pack_sites=1 reproduces the round-3 shipping kernel; the autopick
        # packs G=4 sites per MXU dot at T=20 (block-diagonal exact-zero
        # softmax, kernels/temporal_attention.py PACK_LANES); p8 probes past
        # the one-lane-tile cap (G·T = 160 → two lane tiles per dot)
        "base_p1": make_fn(pack_sites=1),
        "base_p4": make_fn(pack_sites=4),
        "base_p8": make_fn(pack_sites=8),
        "oproj_p1": make_fn(wo=wo, bo=bo, pack_sites=1),
        "oproj_p4": make_fn(wo=wo, bo=bo, pack_sites=4),
        "oproj_p8": make_fn(wo=wo, bo=bo, pack_sites=8),
    }
    for name, fn in list(variants.items()):
        t0 = time.perf_counter()
        try:
            np.asarray(fn(q, k, v))
        except Exception as e:  # e.g. VMEM scoped-limit OOM at big blocks
            print(f"{name}: FAILED to compile ({str(e)[:120]})", flush=True)
            del variants[name]
            continue
        print(f"{name}: compiled in {time.perf_counter() - t0:.0f}s",
              flush=True)

    times = {n: [] for n in variants}
    for i in range(PAIRS):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            np.asarray(fn(q, k, v))
            times[name].append((time.perf_counter() - t0) / ITERS * 1e3)
        print(f"round {i}: " + "  ".join(
            f"{n}={times[n][-1]:.2f}ms" for n in variants), flush=True)
    print("medians: " + "  ".join(
        f"{n}={np.median(ts):.2f}ms" for n, ts in times.items()), flush=True)


if __name__ == "__main__":
    main()
