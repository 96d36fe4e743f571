"""Native C++ data pipeline: build, bind, and match the NumPy reference."""

import numpy as np
import pytest

from npvp_tpu.data import native_bindings as nb
from npvp_tpu.data.transforms import CenterCrop, Normalize, Resize

pytestmark = pytest.mark.skipif(not nb.native_available(),
                                reason="native lib unavailable")


def test_transform_batch_matches_python_pipeline():
    rng = np.random.default_rng(0)
    clips = rng.random((3, 2, 120, 160, 1), np.float32)
    mean, std = 0.6013795, 2.7570653

    got = nb.transform_batch(clips, crop=(120, 120), out_size=(64, 64),
                             hflips=np.zeros(3, np.int32),
                             vflips=np.zeros(3, np.int32),
                             mean=mean, std=std, num_threads=2)
    assert got.shape == (3, 2, 64, 64, 1)

    # python reference: crop → resize (cv2 bilinear) → normalize
    crop, resize, norm = (CenterCrop((120, 120)), Resize((64, 64)),
                          Normalize(mean, std))
    for n in range(3):
        expect = norm(resize(crop(clips[n])))
        np.testing.assert_allclose(got[n], expect, atol=2e-3)


def test_transform_batch_flips():
    clips = np.arange(2 * 1 * 4 * 4 * 1, dtype=np.float32).reshape(
        2, 1, 4, 4, 1)
    got = nb.transform_batch(clips, crop=None, out_size=(4, 4),
                             hflips=np.array([1, 0], np.int32),
                             vflips=np.array([0, 1], np.int32),
                             mean=0.0, std=1.0)
    np.testing.assert_allclose(got[0], clips[0, :, :, ::-1])
    np.testing.assert_allclose(got[1], clips[1, :, ::-1])


def test_synth_moving_sprites_deterministic_and_valid():
    sprites = np.random.default_rng(0).random((5, 8, 8)).astype(np.float32)
    seeds = np.arange(4, dtype=np.uint64)
    a = nb.synth_moving_sprites_batch(sprites, 6, 32, 2, False, seeds)
    b = nb.synth_moving_sprites_batch(sprites, 6, 32, 2, False, seeds)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (4, 6, 32, 32, 1)
    assert a.max() <= 1.0 and a.min() >= 0.0
    assert a.max() > 0.1
    # motion between frames, different clips differ
    assert np.abs(a[0, 1] - a[0, 0]).max() > 0
    assert np.abs(a[1] - a[0]).max() > 0
