"""I3D / FVD numerical parity against the genuine reference implementation.

VERDICT round-1 item 3: the FVD chain (reference utils/pytorch_i3d.py:7-322 +
utils/fvd.py:41-57,160-185,275-287) must be *numerically* validated, not just
structurally — a silent TF-SAME-padding or pooling mismatch would corrupt
every FVD claim. The chain is pinned in three pieces that compose to the full
pipeline: preprocessing, the I3D forward, and the Fréchet distance.
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _load_ref_module(name):
    """Load a reference utils/*.py file directly (bypassing the reference's
    utils/__init__.py, which imports torchvision/lightning); fvd.py and
    pytorch_i3d.py have no relative imports."""
    import importlib.util

    path = "/root/reference/" + name.replace(".", "/") + ".py"
    spec = importlib.util.spec_from_file_location("ref_" + name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_preprocess_matches_reference():
    """preprocess_videos ≡ reference preprocess_single (utils/fvd.py:160-185):
    shorter-side bilinear resize (align_corners=False), center crop,
    [0,1]→[-1,1] — checked on a non-square video where crop semantics bite."""
    import torch.nn.functional as F

    from npvp_tpu.eval.fvd import preprocess_videos

    rng = np.random.default_rng(0)
    video = rng.random((1, 3, 48, 64, 3), np.float32)  # N T H W C, [0, 1]

    got = np.asarray(preprocess_videos(video, target=224))

    # reference path: CTHW in [0, 1]
    v = torch.from_numpy(video[0].transpose(3, 0, 1, 2))  # C T H W
    import math
    c, t, h, w = v.shape
    scale = 224 / min(h, w)
    size = (224, math.ceil(w * scale)) if h < w else (math.ceil(h * scale),
                                                      224)
    v = F.interpolate(v, size=size, mode="bilinear", align_corners=False)
    _, _, h, w = v.shape
    h0, w0 = (h - 224) // 2, (w - 224) // 2
    v = v[:, :, h0:h0 + 224, w0:w0 + 224]
    ref = ((v - 0.5) * 2).numpy().transpose(1, 2, 3, 0)[None]  # N T H W C

    assert got.shape == ref.shape == (1, 3, 224, 224, 3)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_frechet_matches_reference():
    """frechet_distance ≡ reference utils/fvd.py:275-287 on synthetic
    well-conditioned Gaussian feature sets."""
    fvd_ref = _load_ref_module("utils.fvd")
    from npvp_tpu.eval.fvd import frechet_distance

    rng = np.random.default_rng(1)
    a = rng.standard_normal((256, 40)).astype(np.float64)
    b = (rng.standard_normal((256, 40)) * 1.3 + 0.5).astype(np.float64)
    ours = frechet_distance(a, b)
    theirs = float(fvd_ref.frechet_distance(torch.from_numpy(a),
                                            torch.from_numpy(b)))
    assert abs(ours - theirs) / max(abs(theirs), 1e-9) < 1e-4, (ours, theirs)


@pytest.mark.slow
def test_i3d_forward_numerical_parity():
    """Flax InceptionI3d forward ≡ reference utils/pytorch_i3d.py forward
    (converted random weights + randomized BN statistics), atol-level.

    Exercises every SAME-padded conv/pool, the BN eps (1e-5), and the exact
    AvgPool3d([2,7,7]) → logits → temporal-mean head."""
    pytorch_i3d = _load_ref_module("utils.pytorch_i3d")
    from npvp_tpu.eval.i3d import InceptionI3d
    from npvp_tpu.tools.torch_converter import convert_i3d

    torch.manual_seed(0)
    net = pytorch_i3d.InceptionI3d(num_classes=400, in_channels=3)
    net.eval()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm3d):
                m.running_mean.normal_(0.0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.05)
                m.bias.normal_(0.0, 0.05)

    variables = convert_i3d(net.state_dict())
    rng = np.random.default_rng(2)
    x = (rng.random((1, 9, 224, 224, 3), np.float32) - 0.5) * 2.0

    with torch.no_grad():
        # reference takes NCTHW
        ref = net(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()

    got = np.asarray(InceptionI3d(dtype=jnp.float32).apply(
        variables, jnp.asarray(x)))
    assert got.shape == ref.shape == (1, 400)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)
