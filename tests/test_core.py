import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from npvp_tpu.core.checkpoint import CheckpointManager
from npvp_tpu.core.mesh import (batch_sharding, make_mesh, param_shardings,
                                param_spec, shard_batch)
from npvp_tpu.core.optim import (clip_subtree_by_global_norm,
                                 cosine_warm_restarts, make_ae_optimizer,
                                 make_predictor_optimizer)
from npvp_tpu.core.train_state import TrainState, param_count
from jax.sharding import PartitionSpec as P


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh = make_mesh(data=-1, model=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    # subset meshes are allowed (debug batches on big hosts)
    mesh = make_mesh(data=3, model=2)
    assert mesh.shape["data"] == 3
    # data axis clamps to a divisor of the batch size
    mesh = make_mesh(data=8, batch_size=6)
    assert mesh.shape["data"] == 2
    with pytest.raises(ValueError):
        make_mesh(data=16, model=2)


def test_param_spec_rules():
    assert param_spec("/decoder/layer_0/slmhsa/attn/wq/kernel") == \
        P(None, "model", None)
    assert param_spec("/decoder/layer_0/slmhsa/attn/wo/kernel") == \
        P("model", None, None)
    assert param_spec("/decoder/layer_0/linear1/kernel") == P(None, "model")
    assert param_spec("/decoder/layer_0/linear2/kernel") == P("model", None)
    assert param_spec("/encoder/block0/conv/kernel") == P()


def test_batch_and_param_sharding():
    mesh = make_mesh(data=4, model=2)
    batch = {"past": jnp.zeros((8, 3, 16, 16, 1))}
    sharded = shard_batch(mesh, batch)
    assert sharded["past"].sharding.spec == P("data")

    params = {"linear1": {"kernel": jnp.zeros((16, 64))},
              "other": {"kernel": jnp.zeros((3, 3, 4, 8))},
              # not divisible by model axis → replicated by the guard
              "odd": {"linear1": {"kernel": jnp.zeros((4, 7))}}}
    shardings = param_shardings(mesh, params)
    assert shardings["linear1"]["kernel"].spec == P(None, "model")
    assert shardings["other"]["kernel"].spec == P()
    assert shardings["odd"]["linear1"]["kernel"].spec == P()


def test_cosine_warm_restarts_schedule():
    sched = cosine_warm_restarts(1e-3, 1e-7, steps_per_cycle=100)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(50)) == pytest.approx((1e-3 + 1e-7) / 2, rel=1e-3)
    # restart at the cycle boundary
    assert float(sched(100)) == pytest.approx(1e-3)
    assert float(sched(99)) < 1e-5


def test_clip_subtree_by_global_norm():
    clip = clip_subtree_by_global_norm(1.0, lambda p: p.startswith("/decoder"))
    grads = {"decoder": {"w": jnp.full((4,), 10.0)},
             "encoder": {"w": jnp.full((4,), 10.0)}}
    state = clip.init(grads)
    updates, _ = clip.update(grads, state)
    # decoder grads rescaled to global norm 1, encoder untouched
    np.testing.assert_allclose(
        float(jnp.linalg.norm(updates["decoder"]["w"])), 1.0, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(updates["encoder"]["w"]), 10.0)

    # small grads pass through unchanged
    grads_small = {"decoder": {"w": jnp.full((4,), 0.01)},
                   "encoder": {"w": jnp.full((4,), 0.01)}}
    updates, _ = clip.update(grads_small, state)
    np.testing.assert_allclose(np.asarray(updates["decoder"]["w"]), 0.01,
                               rtol=1e-5)


def test_train_state_step():
    params = {"w": jnp.array([1.0, 2.0])}
    tx = make_ae_optimizer(0.1)
    state = TrainState.create(apply_fn=lambda v, x: x, params=params,
                              batch_stats={}, tx=tx)
    grads = {"w": jnp.array([1.0, 1.0])}
    new = state.apply_gradients(grads)
    assert int(new.step) == 1
    assert float(new.params["w"][0]) < 1.0  # moved against the gradient
    assert param_count(params) == 2


def test_predictor_optimizer_runs():
    tx = make_predictor_optimizer(1e-4, 1.0, True, 1e-7, 100)
    params = {"decoder": {"w": jnp.ones((4, 4))},
              "nrmlp": {"B": jnp.ones((8, 3))}}
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert float(jnp.abs(new["decoder"]["w"] - 1.0).max()) > 0


def test_checkpoint_roundtrip(tmp_path):
    mngr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2,
                             monitor="loss", mode="min")
    state = {"params": {"w": jnp.arange(4, dtype=jnp.float32)},
             "step": jnp.array(0)}
    mngr.save(0, state, metrics={"loss": 1.0})
    state2 = {"params": {"w": jnp.arange(4, dtype=jnp.float32) * 2},
              "step": jnp.array(1)}
    mngr.save(1, state2, metrics={"loss": 0.5})
    mngr.wait()
    assert mngr.latest_step() == 1
    assert mngr.best_step() == 1

    template = jax.tree.map(jnp.zeros_like, state)
    restored = mngr.restore(template)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(4) * 2)
    restored0 = mngr.restore(template, step=0)
    np.testing.assert_array_equal(np.asarray(restored0["params"]["w"]),
                                  np.arange(4))
    mngr.close()
