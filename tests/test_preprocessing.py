"""tools/preprocessing: the dataset-preparation path (reference
pre_processing.py) — frame subsampling, the motion-energy empty-frame
filter (the detectron2-replacement divergence, DESIGN.md), and the
Cityscapes square-crop/resize."""

import numpy as np
import pytest
from PIL import Image

from npvp_tpu.tools import preprocessing as pp


def _write_frames(d, arrs):
    d.mkdir(parents=True, exist_ok=True)
    for i, a in enumerate(arrs):
        Image.fromarray(a).save(d / f"{i:04d}.png")


def test_subsample_frames(tmp_path):
    src = tmp_path / "src"
    _write_frames(src, [np.full((4, 4), i, np.uint8) for i in range(10)])
    kept = pp.subsample_frames(src, tmp_path / "out", keep_every=3)
    assert kept == 4  # frames 0, 3, 6, 9
    names = sorted(p.name for p in (tmp_path / "out").iterdir())
    assert names == ["0000.png", "0003.png", "0006.png", "0009.png"]


def test_remove_empty_frames_keeps_moving_person(tmp_path):
    """Static background frames are dropped; frames where a bright 'person'
    block moves through the view survive the median-energy filter."""
    rng = np.random.default_rng(0)
    bg = rng.integers(0, 30, (32, 32), np.uint8)
    arrs = []
    for i in range(12):
        f = bg.copy()
        if 4 <= i < 8:  # person visible in the middle third only
            f[8:24, 2 + 6 * (i - 4): 10 + 6 * (i - 4)] = 220
        arrs.append(f)
    src = tmp_path / "src"
    _write_frames(src, arrs)
    kept = pp.remove_empty_frames(src, tmp_path / "out",
                                  energy_threshold=1.5)
    names = sorted(p.name for p in (tmp_path / "out").iterdir())
    assert kept == 4
    assert names == [f"{i:04d}.png" for i in range(4, 8)]


def test_cityscapes_crop_resize(tmp_path):
    pytest.importorskip("cv2")
    src = tmp_path / "in" / "aachen"
    _write_frames(src, [np.zeros((64, 128, 3), np.uint8) for _ in range(2)])
    n = pp.cityscapes_crop_resize(tmp_path / "in", tmp_path / "out", size=32)
    assert n == 2
    out = np.asarray(Image.open(tmp_path / "out" / "aachen" / "0000.png"))
    assert out.shape == (32, 32, 3)  # square center crop then resize
