"""Dump the optimized HLO of the flagship inference pipeline and map the
profiler's hot op names (fusion.NNNN / copy.NNNN / reshape.NNNN) back to the
instructions — shapes, operands, and source metadata — so trace findings
("20% of device time is copy/reshape") become actionable.

Usage:
    python tools/hlo_probe.py                # compile + write /tmp/pipeline_hlo.txt
    python tools/hlo_probe.py fusion.3611 …  # grep instructions by name
"""

import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

OUT = "/tmp/pipeline_hlo.txt"


def compile_and_dump():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_config
    from npvp_tpu.models.coords import coordinate_grid, spatial_index_lists
    from npvp_tpu.models.inference import VideoPredictor
    from npvp_tpu.nn.resnet_ae import FrameAutoEncoder

    cfg = _flagship_config()
    vp = VideoPredictor.from_random_init(cfg, dtype=jnp.bfloat16)
    p = cfg.Predictor
    h, w = spatial_index_lists(p.max_H, p.max_W)
    oc = coordinate_grid(jnp.arange(10, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    tc = coordinate_grid(jnp.arange(10, 20, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)

    @jax.jit
    def pipeline(ae_vars, pred_vars, frames, key):
        feats = vp.ae.apply(ae_vars, frames, train=False,
                            method=FrameAutoEncoder.encode)
        out = vp.predictor.apply(pred_vars, feats, oc, tc, 10,
                                 rngs={"latent": key})
        return vp.ae.apply(ae_vars, out.pred_features, train=False,
                           method=FrameAutoEncoder.decode)

    frames = jnp.zeros((64, 10, 64, 64, 1), jnp.float32)
    txt = pipeline.lower(vp.ae_vars, vp.predictor_vars, frames,
                         jax.random.key(0)).compile().as_text()
    pathlib.Path(OUT).write_text(txt)
    print(f"wrote {OUT}: {len(txt) / 1e6:.1f} MB")


def lookup(names):
    txt = pathlib.Path(OUT).read_text()
    for name in names:
        print(f"===== {name}")
        # the defining line (fusion roots include the fused computation name)
        for m in re.finditer(rf"^\s*%?{re.escape(name)}\s*=.*$", txt,
                             re.MULTILINE):
            print(m.group(0)[:400])
        # fused computation body, if any
        m = re.search(rf"%fused_computation[^\n]*{re.escape(name)}", txt)
        if m:
            print(m.group(0)[:400])


if __name__ == "__main__":
    if len(sys.argv) > 1:
        lookup(sys.argv[1:])
    else:
        compile_and_dump()
