import jax.numpy as jnp
import numpy as np

from npvp_tpu.models.coords import (coordinate_grid, full_coordinate_volume,
                                    spatial_index_lists, task_time_lists)


def test_coordinate_grid_layout_and_normalization():
    t = jnp.array([0.0, 1.0, 2.0])
    h = jnp.array([0.0, 1.0])
    w = jnp.array([0.0, 1.0])
    coor = coordinate_grid(t, h, w, max_T=4.0, max_H=2.0, max_W=2.0)
    assert coor.shape == (3 * 2 * 2, 3)
    # (t, h, w) order, t-major then h then w
    np.testing.assert_allclose(coor[0], [0.0, 0.0, 0.0])
    np.testing.assert_allclose(coor[1], [0.0, 0.0, 0.5])
    np.testing.assert_allclose(coor[2], [0.0, 0.5, 0.0])
    np.testing.assert_allclose(coor[4], [0.25, 0.0, 0.0])
    assert float(coor.max()) <= 1.0 and float(coor.min()) >= 0.0


def test_fractional_time_coordinates():
    t = jnp.array([5.25, 10.5])
    h, w = spatial_index_lists(2, 2)
    coor = coordinate_grid(t, h, w, max_T=20.0, max_H=2.0, max_W=2.0)
    np.testing.assert_allclose(coor[0, 0], 5.25 / 20.0)
    np.testing.assert_allclose(coor[4, 0], 10.5 / 20.0)


def test_task_time_lists():
    to, tp = task_time_lists("VFP", 10, 10)
    np.testing.assert_array_equal(np.asarray(to), np.arange(10))
    np.testing.assert_array_equal(np.asarray(tp), np.arange(10, 20))

    to, tp = task_time_lists("VPE", 10, 10)
    np.testing.assert_array_equal(np.asarray(to), np.arange(10, 20))
    np.testing.assert_array_equal(np.asarray(tp), np.arange(10))

    # VFI: observe 6 boundary frames, interpolate middle 8 (reference
    # models/Predictor.py:30-37)
    to, tp = task_time_lists("VFI", 7, 7, context_p=3, context_f=3)
    np.testing.assert_array_equal(np.asarray(to), [0, 1, 2, 11, 12, 13])
    np.testing.assert_array_equal(np.asarray(tp), np.arange(3, 11))


def test_full_coordinate_volume_matches_grid():
    vol = full_coordinate_volume(4, 2, 2)
    assert vol.shape == (4, 2, 2, 3)
    h, w = spatial_index_lists(2, 2)
    flat = coordinate_grid(jnp.arange(4, dtype=jnp.float32), h, w, 4, 2, 2)
    np.testing.assert_allclose(np.asarray(vol.reshape(-1, 3)),
                               np.asarray(flat))
