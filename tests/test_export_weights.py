"""Committable weights artifact (npvp_tpu/tools/export_weights.py).

Round-3 lesson: trained checkpoints outside git were wiped at the round
boundary. The artifact's contract: one compressed npz round-trips the
(AE + predictor) x (params + batch_stats) trees; float16 storage drift is
bounded; VideoPredictor.from_weights / a .npz ckpt path reproduce the
original model's predictions within float16 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from npvp_tpu.models.inference import VideoPredictor
from npvp_tpu.tools.export_weights import (load_weights, save_weights)
from tests.test_inference import small_cfg


def _tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, f"{prefix}/{k}")
    else:
        yield prefix, tree


def test_roundtrip_and_from_weights(tmp_path):
    cfg = small_cfg()
    vp = VideoPredictor.from_random_init(cfg, dtype=jnp.float32)
    out = tmp_path / "weights.npz"
    save_weights(out, jax.tree.map(np.asarray, vp.ae_vars),
                 jax.tree.map(np.asarray, vp.predictor_vars),
                 meta={"pred_step": 123})

    ae_vars, pred_vars, meta = load_weights(out)
    assert meta["pred_step"] == 123
    # identical tree structure, float16-bounded value drift
    orig = dict(_tree_paths(jax.tree.map(np.asarray, vp.predictor_vars)))
    loaded = dict(_tree_paths(pred_vars))
    assert orig.keys() == loaded.keys()
    for k in orig:
        np.testing.assert_allclose(loaded[k], orig[k], rtol=2e-3, atol=2e-3)

    # the artifact serves: predictions match the source model within f16
    vp2 = VideoPredictor.from_weights(cfg, out, dtype=jnp.float32)
    frames = np.random.default_rng(0).random((1, 2, 16, 16, 1), np.float32)
    key = jax.random.key(0)
    a = np.asarray(vp.predict(frames, [0, 1], [2, 3], key), np.float32)
    b = np.asarray(vp2.predict(frames, [0, 1], [2, 3], key), np.float32)
    assert np.abs(a - b).max() < 0.02

    # .npz checkpoint path routes through from_weights
    vp3 = VideoPredictor.from_checkpoints(cfg, "unused", str(out),
                                          dtype=jnp.float32)
    c = np.asarray(vp3.predict(frames, [0, 1], [2, 3], key), np.float32)
    np.testing.assert_array_equal(b, c)


def test_cli_ae_only_then_chain(tmp_path):
    """The watchdog path: stage-1 exports an AE-only artifact; after stage-2,
    the CLI chains --ae_ckpt <that npz> with the predictor's Orbax dir into
    one full artifact (tools/round_end_watchdog.sh)."""
    from npvp_tpu.core.checkpoint import CheckpointManager
    from npvp_tpu.models.predictor import build_predictor
    from npvp_tpu.tools.export_weights import main
    from npvp_tpu.train.stage1_ae import build_ae, init_state
    from npvp_tpu.train.stage2_predictor import init_predictor_state

    overrides = [
        "Dataset.img_size=16", "Dataset.num_past_frames=2",
        "Dataset.num_future_frames=2", "Dataset.test_num_past_frames=2",
        "Dataset.test_num_future_frames=2", "AE.ngf=4",
        "AE.n_downsampling=1", "AE.num_res_blocks=1",
        "Predictor.max_T=4", "Predictor.min_lo=1", "Predictor.max_lo=2",
        "Predictor.embed_dim=8", "Predictor.num_heads=2",
        "Predictor.transformer_layers=1",
        "Predictor.evt_former_num_layers=1",
        "Predictor.evt_hidden_channels=4", "Predictor.dim_feedforward=16",
        "Env.platform=cpu",
    ]
    cfg_path = "npvp_tpu/configs/config_SMMNIST_Unified_NPVP-D.yaml"
    from npvp_tpu.core.config import load_config
    cfg = load_config(cfg_path, overrides=overrides)

    ae = build_ae(cfg, jnp.float32)
    ae_state = init_state(cfg, ae, (1, 4, 16, 16, 1))
    m1 = CheckpointManager(tmp_path / "ae", monitor="L1_loss_valid",
                           mode="min")
    m1.save(0, ae_state, metrics={"L1_loss_valid": 1.0})
    m1.wait()

    ae_npz = tmp_path / "stage1.npz"
    main(["--config_path", cfg_path, "--out", str(ae_npz), "--ae_only",
          "--ae_ckpt", str(tmp_path / "ae")]
         + [f"--override={o}" for o in overrides])
    ae_vars, pred_vars, meta = load_weights(ae_npz)
    assert jax.tree_util.tree_leaves(ae_vars["params"])
    assert not jax.tree_util.tree_leaves(pred_vars["params"])
    assert meta["pred_step"] == 0

    pred_state = init_predictor_state(
        cfg, build_predictor(cfg, jnp.float32), 1)
    m2 = CheckpointManager(tmp_path / "pred", monitor="loss_val", mode="min")
    m2.save(7, pred_state.replace(step=7), metrics={"loss_val": 0.5})
    m2.wait()

    full_npz = tmp_path / "full.npz"
    main(["--config_path", cfg_path, "--out", str(full_npz), "--best",
          "--ae_ckpt", str(ae_npz), "--pred_ckpt", str(tmp_path / "pred")]
         + [f"--override={o}" for o in overrides])
    ae2, pred2, meta2 = load_weights(full_npz)
    assert meta2["pred_step"] == 7
    a = dict(_tree_paths(ae_vars["params"]))
    b = dict(_tree_paths(ae2["params"]))
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    assert jax.tree_util.tree_leaves(pred2["params"])


def test_large_magnitude_arrays_stay_float32(tmp_path):
    big = {"params": {"w": np.array([1e5, -2e5], np.float32)},
           "batch_stats": {}}
    small = {"params": {"b": np.array([0.5], np.float32)}, "batch_stats": {}}
    out = tmp_path / "w.npz"
    save_weights(out, big, small)
    ae_vars, pred_vars, _ = load_weights(out)
    # float16 would have clipped 2e5 to inf — must round-trip exactly
    np.testing.assert_array_equal(ae_vars["params"]["w"],
                                  big["params"]["w"])
    with np.load(out) as data:
        assert data["vars/ae/params/w"].dtype == np.float32
        assert data["vars/pred/params/b"].dtype == np.float16
