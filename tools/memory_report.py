"""Per-device train-state memory under the sharding configurations.

Computes, WITHOUT allocating (jax.eval_shape + NamedSharding.shard_shape),
the per-device bytes of the full flagship stage-2 train state (params +
AdamW moments + batch stats) under: replicated DP, Megatron TP, ZeRO-3
FSDP, and TP+FSDP — the number that decides whether a deeper/wider variant
fits a chip.

    python tools/memory_report.py [--data 4] [--model 2]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap0 = argparse.ArgumentParser(add_help=False)
    ap0.add_argument("--data", type=int, default=4)
    ap0.add_argument("--model", type=int, default=2)
    pre, _ = ap0.parse_known_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", pre.data * pre.model)
    except RuntimeError:
        pass  # backend already initialized (e.g. under pytest)

    import jax.numpy as jnp
    import numpy as np

    from npvp_tpu.core.mesh import make_mesh, tree_shardings
    from npvp_tpu.models.predictor import build_predictor
    from npvp_tpu.train.stage2_predictor import init_predictor_state
    from __graft_entry__ import _flagship_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--data", type=int, default=4)
    ap.add_argument("--model", type=int, default=2)
    args = ap.parse_args(argv)

    cfg = _flagship_config()  # full depth: 8 decoder + 4 EVT-former layers
    predictor = build_predictor(cfg, jnp.bfloat16)
    state_shape = jax.eval_shape(
        lambda: init_predictor_state(cfg, predictor, steps_per_epoch=100))

    mesh = make_mesh(data=args.data, model=args.model)

    def per_device_mb(fsdp, tp):
        sh = tree_shardings(mesh, state_shape, fsdp=fsdp, tp=tp)
        total = 0
        for leaf, s in zip(jax.tree_util.tree_leaves(state_shape),
                           jax.tree_util.tree_leaves(sh)):
            shape = getattr(leaf, "shape", ())
            dtype = getattr(leaf, "dtype", None)
            if dtype is None:
                continue
            shard = s.shard_shape(tuple(shape))
            total += int(np.prod(shard, initial=1)) * jnp.dtype(dtype).itemsize
        return total / 2**20

    rows = [("replicated (plain DP)", per_device_mb(False, False)),
            (f"TP over model={args.model}", per_device_mb(False, True)),
            (f"FSDP over data={args.data}", per_device_mb(True, False)),
            ("TP + FSDP", per_device_mb(True, True))]
    print(f"flagship stage-2 train state, mesh data={args.data} "
          f"model={args.model}:")
    for name, mb in rows:
        print(f"  {name:<24} {mb:8.1f} MB/device")


if __name__ == "__main__":
    main(sys.argv[1:])
