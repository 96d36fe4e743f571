"""PatchGAN discriminator, GAN losses, Noam schedule, sine embeddings, and
the adversarial stage-2 training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npvp_tpu.core.optim import noam_schedule
from npvp_tpu.nn.discriminator import (PatchDiscriminator, gan_loss,
                                       gradient_penalty)
from npvp_tpu.nn.position_encoding import (sine_position_encoding_1d,
                                           sine_position_encoding_2d,
                                           sine_position_encoding_3d)


def test_patch_discriminator_shapes():
    disc = PatchDiscriminator(ndf=8, n_layers=3)
    x = jax.random.normal(jax.random.key(0), (2, 64, 64, 1))
    variables = disc.init(jax.random.key(1), x)
    logits = disc.apply(variables, x)
    # 64 → 32 → 16 → 8 (stride-1 tail keeps ~8)
    assert logits.shape[0] == 2 and logits.shape[-1] == 1
    assert logits.shape[1] < 10


def test_gan_loss_modes():
    logits = jnp.array([[2.0], [-1.0]])
    # vanilla: BCE-with-logits against 1/0
    v_real = float(gan_loss(logits, True, "vanilla"))
    v_fake = float(gan_loss(logits, False, "vanilla"))
    import torch
    t = torch.tensor([[2.0], [-1.0]])
    bce = torch.nn.BCEWithLogitsLoss()
    assert v_real == pytest.approx(float(bce(t, torch.ones_like(t))), abs=1e-5)
    assert v_fake == pytest.approx(float(bce(t, torch.zeros_like(t))),
                                   abs=1e-5)
    # lsgan
    assert float(gan_loss(logits, True, "lsgan")) == pytest.approx(
        ((2 - 1) ** 2 + (-1 - 1) ** 2) / 2)
    # wgangp
    assert float(gan_loss(logits, True, "wgangp")) == pytest.approx(-0.5)
    with pytest.raises(ValueError):
        gan_loss(logits, True, "hinge")


def test_gradient_penalty():
    # critic = sum of 2*x → gradient norm 2 per sample → penalty (2-1)^2 * 10
    critic = lambda x: jnp.sum(2.0 * x, axis=(1, 2, 3))
    real = jnp.ones((4, 4, 4, 1))
    fake = jnp.zeros((4, 4, 4, 1))
    gp = float(gradient_penalty(critic, real, fake, jax.random.key(0)))
    n_elem = 4 * 4 * 1
    expect = (2.0 * np.sqrt(n_elem) - 1) ** 2 * 10.0
    assert gp == pytest.approx(expect, rel=1e-4)


def test_noam_schedule():
    sched = noam_schedule(512, factor=2.0, warmup_steps=100)
    values = [float(sched(s)) for s in [1, 50, 100, 200, 400]]
    assert values[0] < values[1] < values[2]      # warmup rises
    assert values[2] > values[3] > values[4]      # then decays
    assert values[2] == pytest.approx(2.0 * 512 ** -0.5 * 100 ** -0.5)


def test_sine_position_encodings():
    pe = sine_position_encoding_1d(10, 64)
    assert pe.shape == (10, 64)
    assert float(jnp.abs(pe).max()) <= 1.0
    pe2 = sine_position_encoding_2d(8, 8, 64)
    assert pe2.shape == (8, 8, 128)
    pe3 = sine_position_encoding_3d(4, 8, 8, 64)
    assert pe3.shape == (4, 8, 8, 192)
    # distinct positions get distinct codes
    assert float(jnp.abs(pe3[0, 0, 0] - pe3[1, 2, 3]).max()) > 0.1


def test_gan_training_step(tmp_path):
    """One adversarial stage-2 step end-to-end on tiny shapes."""
    from tests.test_training import tiny_config
    from npvp_tpu.core.mesh import make_mesh
    from npvp_tpu.models.predictor import build_predictor
    from npvp_tpu.train.stage1_ae import build_ae
    from npvp_tpu.train.stage2_predictor import (init_predictor_state,
                                                 make_gan_steps)

    cfg = tiny_config(tmp_path)
    cfg.Predictor.use_gan = True
    cfg.Predictor.ndf = 4
    mesh = make_mesh(batch_size=2)
    ae = build_ae(cfg, jnp.float32)
    ae_vars = ae.init(jax.random.key(0), jnp.zeros((1, 4, 16, 16, 1)))
    predictor = build_predictor(cfg, jnp.float32)
    state_g = init_predictor_state(cfg, predictor, 1)
    train_step, _, place, init_disc = make_gan_steps(
        cfg, predictor, ae, ae_vars, mesh, "pairs")
    state_d = init_disc(jax.random.key(1))

    batch = place({
        "past": np.random.default_rng(0).random((2, 2, 16, 16, 1),
                                                np.float32),
        "future": np.random.default_rng(1).random((2, 2, 16, 16, 1),
                                                  np.float32)})
    state_g, state_d, metrics = train_step(state_g, state_d, batch,
                                           jax.random.key(2))
    assert int(state_g.step) == 1 and int(state_d.step) == 1
    for k in ("loss", "loss_D", "loss_G_gan", "loss_D_fake", "loss_D_real"):
        assert np.isfinite(float(metrics[k])), k
