"""Multi-device correctness on the virtual CPU mesh: data/tensor-parallel
execution must reproduce the single-device computation."""

import jax
import jax.numpy as jnp
import numpy as np

from npvp_tpu.core.mesh import (batch_sharding, make_mesh, shard_batch,
                                shard_params, shard_state)
from npvp_tpu.models.coords import coordinate_grid, spatial_index_lists
from npvp_tpu.models.predictor import NPPredictor


def _tiny_model_and_inputs():
    model = NPPredictor(embed_dim=16, num_heads=4, window_size=4,
                        transformer_layers=1, evt_former_num_layers=1,
                        evt_hidden_channels=8, dim_feedforward=32,
                        dropout=0.0, drop_path=0.0)
    T, H, W = 4, 8, 8
    h, w = spatial_index_lists(H, W)
    oc = coordinate_grid(jnp.arange(2, dtype=jnp.float32), h, w, T, H, W)
    tc = coordinate_grid(jnp.arange(2, 4, dtype=jnp.float32), h, w, T, H, W)
    obs = jax.random.uniform(jax.random.key(0), (8, 2, H, W, 16))
    variables = model.init({"params": jax.random.key(1)}, obs, oc, tc, 2)
    return model, variables, obs, oc, tc


def test_dp_tp_forward_matches_single_device():
    model, variables, obs, oc, tc = _tiny_model_and_inputs()
    expect = np.asarray(model.apply(variables, obs, oc, tc, 2).pred_features)

    mesh = make_mesh(data=4, model=2)
    sharded_vars = {"params": shard_params(mesh, variables["params"]),
                    "batch_stats": jax.device_put(
                        variables["batch_stats"],
                        jax.sharding.NamedSharding(
                            mesh, jax.sharding.PartitionSpec()))}
    sharded_obs = shard_batch(mesh, obs)

    fn = jax.jit(lambda v, x: model.apply(v, x, oc, tc, 2).pred_features)
    got = np.asarray(fn(sharded_vars, sharded_obs))
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_tp_actually_shards_attention_params():
    model, variables, obs, oc, tc = _tiny_model_and_inputs()
    mesh = make_mesh(data=4, model=2)
    sharded = shard_params(mesh, variables["params"])
    wq = sharded["decoder"]["layer_0"]["slmhsa"]["attn"]["wq"]["kernel"]
    # (C, heads=4, hd) sharded over heads on the model axis
    from jax.sharding import PartitionSpec as P

    assert wq.sharding.spec == P(None, "model", None)
    lin1 = sharded["decoder"]["layer_0"]["linear1"]["kernel"]
    assert lin1.sharding.spec == P(None, "model")


def test_tp_forward_at_flagship_width():
    """TP at the flagship embed_dim=512 / 8-head width (VERDICT round-1 weak
    #9): the Megatron head/FFN splits must divide cleanly and reproduce the
    single-device forward. Tiny in every non-width dimension to stay fast on
    the virtual CPU mesh."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    model = NPPredictor(embed_dim=512, num_heads=8, window_size=4,
                        transformer_layers=1, evt_former_num_layers=1,
                        evt_hidden_channels=16, dim_feedforward=1024,
                        dropout=0.0, drop_path=0.0)
    T, H, W = 2, 4, 4
    h, w = spatial_index_lists(H, W)
    oc = coordinate_grid(jnp.arange(1, dtype=jnp.float32), h, w, T, H, W)
    tc = coordinate_grid(jnp.arange(1, 2, dtype=jnp.float32), h, w, T, H, W)
    obs = jax.random.uniform(jax.random.key(0), (4, 1, H, W, 512)) * 0.1
    variables = model.init({"params": jax.random.key(1)}, obs, oc, tc, 1)
    expect = np.asarray(model.apply(variables, obs, oc, tc, 1).pred_features)

    mesh = make_mesh(data=2, model=4)
    sharded_vars = {"params": shard_params(mesh, variables["params"]),
                    "batch_stats": jax.device_put(
                        variables["batch_stats"],
                        jax.sharding.NamedSharding(
                            mesh, jax.sharding.PartitionSpec()))}
    # heads (8) and FFN hidden (2048) divide the model axis (4): assert the
    # flagship widths actually shard
    wq = sharded_vars["params"]["decoder"]["layer_0"]["slmhsa"]["attn"][
        "wq"]["kernel"]
    from jax.sharding import PartitionSpec as P

    assert wq.sharding.spec == P(None, "model", None) and wq.shape[1] == 8
    got = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, oc, tc, 1).pred_features)(
            sharded_vars, shard_batch(mesh, obs)))
    np.testing.assert_allclose(got, expect, atol=3e-5)


def test_shard_batch_multihost_assembly_path():
    """The multi-host global-array assembly path
    (make_array_from_process_local_data) produces the same placement and
    values as the single-process device_put path, and replicates mask
    leaves instead of splitting them over the data axis."""
    mesh = make_mesh(data=4, model=2)
    batch = {"clip": np.random.default_rng(0).random((8, 3, 4, 4, 1),
                                                     np.float32),
             "obs_mask": np.array([True, True, False])}
    a = shard_batch(mesh, batch, multihost=False)
    b = shard_batch(mesh, batch, multihost=True)
    from jax.sharding import PartitionSpec as P

    assert a["clip"].sharding.spec == b["clip"].sharding.spec == P("data")
    assert a["obs_mask"].sharding.spec == b["obs_mask"].sharding.spec == P()
    np.testing.assert_array_equal(np.asarray(a["clip"]),
                                  np.asarray(b["clip"]))
    np.testing.assert_array_equal(np.asarray(b["obs_mask"]),
                                  batch["obs_mask"])


def test_dp_gradient_matches_single_device():
    """Mean loss + grads over a sharded batch == single-device result (the
    all-reduce jit emits must be exact)."""
    model, variables, obs, oc, tc = _tiny_model_and_inputs()
    target = jax.random.uniform(jax.random.key(5), (8, 2, 8, 8, 16))

    def loss_fn(params, x):
        out = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          x, oc, tc, 2).pred_features
        return jnp.mean(jnp.abs(out - target))

    g_single = jax.grad(loss_fn)(variables["params"], obs)

    mesh = make_mesh(data=8, model=1)
    sp = shard_params(mesh, variables["params"])
    sx = shard_batch(mesh, obs)
    g_sharded = jax.jit(jax.grad(loss_fn))(sp, sx)

    # some leaves carry enormous gradients (LayerNorm of the zeros-initial
    # decoder input — present in the reference architecture too), where
    # reduction-order differences amplify; compare relative Frobenius error
    flat1 = jax.tree_util.tree_leaves(g_single)
    flat2 = jax.tree_util.tree_leaves(g_sharded)
    for a, b in zip(flat1, flat2):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        # relative-or-absolute: near-zero-gradient leaves compare absolutely
        tol = 5e-3 * np.linalg.norm(a) + 1e-4 * np.sqrt(a.size)
        assert np.linalg.norm(a - b) <= tol, (np.linalg.norm(a - b), tol)


def test_fsdp_tree_sharding_rules():
    """ZeRO-3 spec assignment: large leaves get the data axis on their
    largest free dimension, TP-claimed dims are preserved, and small leaves
    (biases, norm scales) stay replicated."""
    from jax.sharding import PartitionSpec as P

    from npvp_tpu.core.mesh import tree_shardings

    mesh = make_mesh(data=4, model=2)
    tree = {"up0_conv": {"kernel": jnp.zeros((3, 3, 64, 128))},
            "linear1": {"kernel": jnp.zeros((256, 512)),
                        "bias": jnp.zeros((512,))},
            "norm": {"scale": jnp.zeros((512,))},
            "wo": {"kernel": jnp.zeros((8, 64, 512))}}
    sh = tree_shardings(mesh, tree, fsdp=True)
    # no TP match → data axis on the largest divisible dim (C_out=128)
    assert sh["up0_conv"]["kernel"].spec == P(None, None, None, "data")
    # TP claims dim 1 (column split), fsdp adds data on dim 0
    assert sh["linear1"]["kernel"].spec == P("data", "model")
    # TP bias rule still applies; below FSDP_MIN_SIZE → no extra data axis
    assert sh["linear1"]["bias"].spec == P("model")
    # small non-TP leaf → replicated
    assert sh["norm"]["scale"].spec == P()
    # TP row-split on dim 0; largest free dim is 2
    assert sh["wo"]["kernel"].spec == P("model", None, "data")
    # fsdp off → unchanged TP-only behavior
    sh0 = tree_shardings(mesh, tree, fsdp=False)
    assert sh0["up0_conv"]["kernel"].spec == P()
    assert sh0["linear1"]["kernel"].spec == P(None, "model")


def test_fsdp_train_step_matches_replicated(monkeypatch):
    """A jitted, donated optimizer step on a ZeRO-3-sharded state (params +
    momentum over the data axis, composed with TP) reproduces the
    single-device trajectory, keeps the sharded layout across steps, and
    actually shards the state (addressable shards smaller than the array)."""
    import optax

    import npvp_tpu.core.mesh as mesh_mod
    from npvp_tpu.core.train_state import TrainState

    # the tiny model's leaves are all below the production FSDP_MIN_SIZE
    monkeypatch.setattr(mesh_mod, "FSDP_MIN_SIZE", 128)

    model, variables, obs, oc, tc = _tiny_model_and_inputs()
    target = jax.random.uniform(jax.random.key(5), (8, 2, 8, 8, 16))
    tx = optax.sgd(0.1, momentum=0.9)

    def make_state():
        return TrainState.create(apply_fn=model.apply,
                                 params=variables["params"],
                                 batch_stats=variables["batch_stats"], tx=tx)

    def loss_fn(params, stats, x):
        out = model.apply({"params": params, "batch_stats": stats},
                          x, oc, tc, 2).pred_features
        return jnp.mean(jnp.abs(out - target))

    def step(state, x):
        grads = jax.grad(loss_fn)(state.params, state.batch_stats, x)
        return state.apply_gradients(grads)

    s0 = make_state()
    for _ in range(3):
        s0 = step(s0, obs)
    expect = jax.tree_util.tree_leaves(s0.params)

    mesh = make_mesh(data=4, model=2)
    state = mesh_mod.shard_state(mesh, make_state(), fsdp=True)
    wq = state.params["decoder"]["layer_0"]["slmhsa"]["attn"]["wq"]["kernel"]
    assert "data" in wq.sharding.spec  # (16, 4, 4): data on dim 0, TP dim 1
    shard_shape = wq.addressable_shards[0].data.shape
    assert shard_shape[0] == wq.shape[0] // 4
    # momentum trace paths embed the param path → same layout as the param
    mom = jax.tree_util.tree_map(lambda l: l, state.opt_state)
    flat = {mesh_mod._path_str(p): l.sharding.spec for p, l in
            jax.tree_util.tree_flatten_with_path(mom)[0]
            if hasattr(l, "sharding")}
    assert any("wq/kernel" in k and "data" in v for k, v in flat.items())

    jstep = jax.jit(step, donate_argnums=0)
    sx = shard_batch(mesh, obs)
    for _ in range(3):
        state = jstep(state, sx)
    wq2 = state.params["decoder"]["layer_0"]["slmhsa"]["attn"]["wq"]["kernel"]

    def _norm(spec):  # XLA drops trailing Nones in output specs
        t = tuple(spec)
        while t and t[-1] is None:
            t = t[:-1]
        return t

    # layout survives the donated step
    assert _norm(wq2.sharding.spec) == _norm(wq.sharding.spec)
    got = jax.tree_util.tree_leaves(state.params)
    for a, b in zip(expect, got):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        tol = 5e-3 * np.linalg.norm(a) + 1e-4 * np.sqrt(a.size)
        assert np.linalg.norm(a - b) <= tol, (np.linalg.norm(a - b), tol)


def test_sp_shard_constrains_activation_layout():
    """sp_shard inside a sequence_parallel context forces the (N, T, H, ...)
    layout batch-over-data / H-over-model; outside it is the identity."""
    from jax.sharding import PartitionSpec as P

    from npvp_tpu.core.mesh import sequence_parallel, sp_shard

    mesh = make_mesh(data=2, model=2)
    x = jnp.zeros((4, 2, 8, 8, 16))
    # the context is consulted at TRACE time (the constraint is baked into
    # the compiled program) — each case below uses a fresh function object so
    # jax's identity-keyed jit cache cannot reuse a trace from another case
    spec_of = lambda arr: getattr(arr.sharding, "spec", None)
    with sequence_parallel(mesh):
        y = jax.jit(lambda t: sp_shard(t))(x)
    assert spec_of(y) == P("data", None, "model")
    # no-op cases (outputs stay on the default device — SingleDeviceSharding,
    # which has no spec): no context / model axis 1 / indivisible H
    assert spec_of(jax.jit(lambda t: sp_shard(t))(x)) != P(
        "data", None, "model")
    with sequence_parallel(make_mesh(data=4, model=1)):
        jax.jit(lambda t: sp_shard(t))(x)  # must not raise
    with sequence_parallel(mesh):
        z = jax.jit(lambda t: sp_shard(t))(jnp.zeros((4, 2, 7, 8, 16)))
    assert spec_of(z) != P("data", None, "model")


def test_sp_forward_matches_single_device():
    """Sequence-parallel (spatial H sharding over the model axis) execution
    reproduces the single-device forward: XLA must insert the depthwise-conv
    halo exchange and the frame-LayerNorm psum correctly (survey §2.5
    "shard N·H·W")."""
    from npvp_tpu.core.mesh import sequence_parallel

    model, variables, obs, oc, tc = _tiny_model_and_inputs()
    expect = np.asarray(model.apply(variables, obs, oc, tc, 2).pred_features)

    mesh = make_mesh(data=2, model=4)
    sharded_vars = {"params": shard_params(mesh, variables["params"]),
                    "batch_stats": jax.device_put(
                        variables["batch_stats"],
                        jax.sharding.NamedSharding(
                            mesh, jax.sharding.PartitionSpec()))}
    fn = jax.jit(lambda v, x: model.apply(v, x, oc, tc, 2).pred_features)
    with sequence_parallel(mesh):
        got = np.asarray(fn(sharded_vars, shard_batch(mesh, obs)))
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_remat_gradients_match():
    """Predictor.remat (per-block jax.checkpoint) must not change the loss or
    its gradients — only the backward-pass memory/FLOP trade."""
    model, variables, obs, oc, tc = _tiny_model_and_inputs()
    target = jax.random.uniform(jax.random.key(5), (8, 2, 8, 8, 16))
    rngs = {"latent": jax.random.key(7), "dropout": jax.random.key(8),
            "droppath": jax.random.key(9)}

    def loss_fn(mdl, params):
        out = mdl.apply({"params": params,
                         "batch_stats": variables["batch_stats"]},
                        obs, oc, tc, 2, target_feats_gt=None, train=True,
                        rngs=rngs, mutable=["batch_stats"])[0].pred_features
        return jnp.mean(jnp.abs(out - target))

    l0, g0 = jax.value_and_grad(lambda p: loss_fn(model, p))(
        variables["params"])
    l1, g1 = jax.value_and_grad(
        lambda p: loss_fn(model.clone(remat=True), p))(variables["params"])
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5,
                                   rtol=1e-4)


def test_video_predictor_shard_matches_single_device():
    """VideoPredictor.shard(mesh) (multi-chip serving placement) reproduces
    the single-device prediction: TP params + data-sharded batch through the
    same jitted pipeline."""
    from npvp_tpu.core.config import Config
    from npvp_tpu.models.inference import VideoPredictor

    cfg = Config()
    cfg.Dataset.img_size = 32
    cfg.Dataset.num_past_frames = 2
    cfg.Dataset.num_future_frames = 2
    cfg.AE.ngf = 8
    cfg.AE.n_downsampling = 2
    cfg.AE.num_res_blocks = 1
    cfg.Predictor.max_T = 4
    cfg.Predictor.embed_dim = 32
    cfg.Predictor.num_heads = 4
    cfg.Predictor.transformer_layers = 1
    cfg.Predictor.evt_former_num_layers = 1
    cfg.Predictor.evt_hidden_channels = 8
    cfg.Predictor.dim_feedforward = 32
    cfg.validate()
    vp = VideoPredictor.from_random_init(cfg, dtype=jnp.float32)
    frames = np.random.default_rng(0).standard_normal((4, 2, 32, 32, 1),
                                                      np.float32)
    expect = np.asarray(vp.vfp(frames, 2))

    vp.shard(make_mesh(data=2, model=2))
    got = np.asarray(vp.vfp(frames, 2))
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_video_predictor_shard_streams_batch_axis():
    """After shard(mesh), predict_stream places the (S, N, ...) stream with
    its batch axis (1) over the data axis and reproduces the single-device
    stream output."""
    from npvp_tpu.core.config import Config
    from npvp_tpu.models.inference import VideoPredictor
    from jax.sharding import PartitionSpec as P

    cfg = Config()
    cfg.Dataset.img_size = 32
    cfg.Dataset.num_past_frames = 2
    cfg.Dataset.num_future_frames = 2
    cfg.AE.ngf = 8
    cfg.AE.n_downsampling = 2
    cfg.AE.num_res_blocks = 1
    cfg.Predictor.max_T = 4
    cfg.Predictor.embed_dim = 32
    cfg.Predictor.num_heads = 4
    cfg.Predictor.transformer_layers = 1
    cfg.Predictor.evt_former_num_layers = 1
    cfg.Predictor.evt_hidden_channels = 8
    cfg.Predictor.dim_feedforward = 32
    cfg.validate()
    vp = VideoPredictor.from_random_init(cfg, dtype=jnp.float32)
    stream = np.random.default_rng(0).standard_normal((2, 4, 2, 32, 32, 1),
                                                      np.float32)
    expect = np.asarray(vp.predict_stream(stream, [0, 1], [2, 3]))

    mesh = make_mesh(data=2, model=2)
    vp.shard(mesh)
    placed = vp._place_frames(stream, batch_axis=1)
    assert placed.sharding.spec[1] == "data"
    assert all(ax is None for i, ax in enumerate(placed.sharding.spec)
               if i != 1)
    got = np.asarray(vp.predict_stream(stream, [0, 1], [2, 3]))
    np.testing.assert_allclose(got, expect, atol=2e-5)
