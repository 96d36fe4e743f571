"""Trainer warm-start from a committed weights artifact.

Round-3/4 lesson: Orbax checkpoint directories live outside git and are
wiped at round boundaries; the ``.npz`` artifact (tools/export_weights.py)
is the only trained state that survives. These tests pin the trainer-side
contract: ``Predictor.resume_ckpt`` / ``AE.resume_ckpt`` /
``Predictor.resume_AE_ckpt`` / ``Predictor.init_det_ckpt_for_vae``
pointing at a ``.npz`` adopt the artifact's params + batch_stats + step
(fresh optimizer moments), and shape mismatches fail fast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npvp_tpu.models.predictor import build_predictor
from npvp_tpu.tools.export_weights import save_weights, warm_start_state
from npvp_tpu.train.stage1_ae import build_ae, init_state
from npvp_tpu.train.stage2_predictor import init_predictor_state, \
    load_frozen_ae, merge_det_init
from tests.test_inference import small_cfg


def _leaves_equal(a, b):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    # the artifact stores float16: ~2^-11 relative round-trip error
    return all(np.allclose(np.asarray(x), np.asarray(y), rtol=1e-3,
                           atol=2e-3)
               for x, y in zip(fa, fb))


def _perturbed(params, delta=0.25):
    return jax.tree.map(lambda a: np.asarray(a) + delta, params)


def test_warm_start_predictor_state(tmp_path):
    cfg = small_cfg()
    pred = build_predictor(cfg, jnp.float32)
    state = init_predictor_state(cfg, pred, 1)
    trained_params = _perturbed(state.params)
    trained_stats = _perturbed(state.batch_stats, 0.5)
    out = tmp_path / "w.npz"
    save_weights(out, {"params": {}, "batch_stats": {}},
                 {"params": trained_params, "batch_stats": trained_stats},
                 meta={"pred_step": 4200})

    fresh_opt = state.opt_state
    warmed = warm_start_state(state, out, which="pred")
    assert int(warmed.step) == 4200
    assert _leaves_equal(warmed.params, trained_params)
    assert _leaves_equal(warmed.batch_stats, trained_stats)
    # optimizer moments stay fresh (the artifact omits them by design)
    assert jax.tree.structure(warmed.opt_state) == \
        jax.tree.structure(fresh_opt)


def test_warm_start_shape_mismatch_fails_fast(tmp_path):
    cfg = small_cfg()
    pred = build_predictor(cfg, jnp.float32)
    state = init_predictor_state(cfg, pred, 1)
    bad = jax.tree.map(np.asarray, state.params)
    # break one leaf's shape
    flat, tree = jax.tree_util.tree_flatten(bad)
    flat[0] = np.zeros(tuple(s + 1 for s in flat[0].shape), np.float32)
    bad = jax.tree_util.tree_unflatten(tree, flat)
    out = tmp_path / "w.npz"
    save_weights(out, {"params": {}, "batch_stats": {}},
                 {"params": bad,
                  "batch_stats": jax.tree.map(np.asarray,
                                              state.batch_stats)})
    with pytest.raises(ValueError, match="shape"):
        warm_start_state(state, out, which="pred")


def test_load_frozen_ae_from_npz(tmp_path):
    cfg = small_cfg()
    ae = build_ae(cfg, jnp.float32)
    d = cfg.Dataset
    clip = d.num_past_frames + d.num_future_frames
    st = init_state(cfg, ae, (1, clip, d.img_size, d.img_size,
                              d.img_channels))
    trained = _perturbed(st.params, 0.125)
    out = tmp_path / "w.npz"
    save_weights(out, {"params": trained, "batch_stats": st.batch_stats},
                 {"params": {}, "batch_stats": {}}, meta={"ae_step": 9})
    cfg.Predictor.resume_AE_ckpt = str(out)
    _, variables = load_frozen_ae(cfg, jnp.float32)
    assert _leaves_equal(variables["params"], trained)


def test_det_to_stochastic_init_from_npz(tmp_path):
    """D→S init (reference train_Predictor_lightning.py strict=False load)
    works from a committed NPVP-D artifact: same-shape leaves adopted,
    stochastic-only leaves keep their fresh init."""
    cfg_d = small_cfg()
    cfg_d.Predictor.stochastic = False
    cfg_d.validate()
    pred_d = build_predictor(cfg_d, jnp.float32)
    st_d = init_predictor_state(cfg_d, pred_d, 1)
    det_params = _perturbed(st_d.params, 0.0625)
    out = tmp_path / "d.npz"
    save_weights(out, {"params": {}, "batch_stats": {}},
                 {"params": det_params, "batch_stats": st_d.batch_stats})

    cfg_s = small_cfg()
    pred_s = build_predictor(cfg_s, jnp.float32)
    st_s = init_predictor_state(cfg_s, pred_s, 1)
    from npvp_tpu.tools.export_weights import load_weights

    _, det_pred, _ = load_weights(out)
    merged = merge_det_init(jax.tree.map(jnp.asarray, det_pred["params"]),
                            st_s.params)
    # every leaf either came from the artifact (shape match) or stayed
    # at the stochastic init — and at least one of each exists
    n_adopted = n_kept = 0
    flat_s = dict(jax.tree_util.tree_flatten_with_path(st_s.params)[0])
    flat_d = dict(jax.tree_util.tree_flatten_with_path(
        jax.tree.map(jnp.asarray, det_pred["params"]))[0])
    for path, leaf in jax.tree_util.tree_flatten_with_path(merged)[0]:
        if path in flat_d and flat_d[path].shape == leaf.shape and \
                np.allclose(np.asarray(leaf), np.asarray(flat_d[path]),
                            atol=2e-3):
            n_adopted += 1
        else:
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(flat_s[path]))
            n_kept += 1
    assert n_adopted > 0
