"""Offline dataset preprocessing tools.

Equivalents of the reference's offline utilities (reference
utils/pre_processing.py): video↔frame conversion via ffmpeg, frame
subsampling, Cityscapes center-crop/resize, zip extraction. The reference's
Detectron2-based KTH empty-frame removal (utils/pre_processing.py:81-179) is
replaced by a dependency-free motion-energy filter — frames whose
pixel-difference energy against the clip median is negligible (no person in
view) are dropped; same goal, no external model.

Every function is callable from the CLI:
    python -m npvp_tpu.tools.preprocessing <command> ...
"""

from __future__ import annotations

import argparse
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import numpy as np


def has_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def video_to_frames(video_path: str | Path, out_dir: str | Path,
                    fps: float | None = None, quality: int = 2) -> int:
    """Extract frames as PNGs (reference pre_processing.py:37-55)."""
    if not has_ffmpeg():
        raise RuntimeError("ffmpeg not found on PATH")
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    cmd = ["ffmpeg", "-y", "-i", str(video_path)]
    if fps:
        cmd += ["-vf", f"fps={fps}"]
    cmd += ["-q:v", str(quality), str(out_dir / "%05d.png")]
    subprocess.run(cmd, check=True, capture_output=True)
    return len(list(out_dir.glob("*.png")))


def frames_to_video(frames_dir: str | Path, out_path: str | Path,
                    fps: float = 25.0) -> None:
    """Assemble frames back into a video (reference pre_processing.py:57-71)."""
    if not has_ffmpeg():
        raise RuntimeError("ffmpeg not found on PATH")
    subprocess.run(["ffmpeg", "-y", "-framerate", str(fps), "-i",
                    str(Path(frames_dir) / "%05d.png"), "-pix_fmt", "yuv420p",
                    str(out_path)], check=True, capture_output=True)


def subsample_frames(frames_dir: str | Path, out_dir: str | Path,
                     keep_every: int) -> int:
    """Keep every N-th frame (reference pre_processing.py:73-79)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(Path(frames_dir).glob("*"))
    kept = 0
    for i, f in enumerate(files):
        if i % keep_every == 0:
            shutil.copy(f, out_dir / f.name)
            kept += 1
    return kept


def remove_empty_frames(frames_dir: str | Path, out_dir: str | Path,
                        energy_threshold: float = 1.5) -> int:
    """Drop near-static frames (KTH clips where the person left the view).
    A frame is kept when its mean absolute difference against the clip's
    median frame exceeds ``energy_threshold`` (in 0-255 units)."""
    from PIL import Image

    files = sorted(Path(frames_dir).glob("*"))
    if not files:
        return 0
    frames = np.stack([np.asarray(Image.open(f).convert("L"), np.float32)
                       for f in files])
    median = np.median(frames, axis=0)
    energy = np.abs(frames - median).mean(axis=(1, 2))
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    kept = 0
    for f, e in zip(files, energy):
        if e > energy_threshold:
            shutil.copy(f, out_dir / f.name)
            kept += 1
    return kept


def cityscapes_crop_resize(in_dir: str | Path, out_dir: str | Path,
                           size: int = 128) -> int:
    """Center-crop Cityscapes frames square and resize (reference
    pre_processing.py:181-221), preserving the city/sequence layout."""
    import cv2

    in_dir, out_dir = Path(in_dir), Path(out_dir)
    count = 0
    for f in sorted(in_dir.rglob("*.png")):
        img = cv2.imread(str(f))
        h, w = img.shape[:2]
        s = min(h, w)
        y0, x0 = (h - s) // 2, (w - s) // 2
        img = cv2.resize(img[y0:y0 + s, x0:x0 + s], (size, size),
                         interpolation=cv2.INTER_LINEAR)
        rel = f.relative_to(in_dir)
        dst = out_dir / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(dst), img)
        count += 1
    return count


def extract_zip(zip_path: str | Path, out_dir: str | Path) -> None:
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(out_dir)


def convert_bair_tfrecords(tfrecord_dir: str | Path, out_dir: str | Path,
                           image_size: int = 64) -> int:
    """BAIR robot-push tfrecords → per-example PNG frame folders (reference
    utils/read_BAIR_tfrecords.py). Requires tensorflow."""
    import tensorflow as tf
    from PIL import Image

    out_dir = Path(out_dir)
    files = sorted(Path(tfrecord_dir).glob("*.tfrecord*"))
    example_idx = 0
    for tfr in files:
        for record in tf.data.TFRecordDataset(str(tfr)):
            ex = tf.train.Example()
            ex.ParseFromString(record.numpy())
            feats = ex.features.feature
            frame_keys = sorted(
                (k for k in feats if "image_aux1/encoded" in k),
                key=lambda k: int(k.split("/")[0]))
            if not frame_keys:
                continue
            ex_dir = out_dir / f"example_{example_idx:06d}"
            ex_dir.mkdir(parents=True, exist_ok=True)
            for t, key in enumerate(frame_keys):
                raw = feats[key].bytes_list.value[0]
                arr = np.frombuffer(raw, np.uint8).reshape(
                    image_size, image_size, 3)
                Image.fromarray(arr).save(ex_dir / f"{t:03d}.png")
            example_idx += 1
    return example_idx


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("video2frames")
    p.add_argument("video"), p.add_argument("out"), p.add_argument(
        "--fps", type=float)
    p = sub.add_parser("frames2video")
    p.add_argument("frames"), p.add_argument("out"), p.add_argument(
        "--fps", type=float, default=25)
    p = sub.add_parser("subsample")
    p.add_argument("frames"), p.add_argument("out"), p.add_argument(
        "--keep_every", type=int, required=True)
    p = sub.add_parser("remove_empty")
    p.add_argument("frames"), p.add_argument("out"), p.add_argument(
        "--threshold", type=float, default=1.5)
    p = sub.add_parser("cityscapes")
    p.add_argument("indir"), p.add_argument("out"), p.add_argument(
        "--size", type=int, default=128)
    p = sub.add_parser("bair")
    p.add_argument("tfrecords"), p.add_argument("out")
    p = sub.add_parser("unzip")
    p.add_argument("zip"), p.add_argument("out")

    args = parser.parse_args(argv)
    if args.cmd == "video2frames":
        print(video_to_frames(args.video, args.out, args.fps))
    elif args.cmd == "frames2video":
        frames_to_video(args.frames, args.out, args.fps)
    elif args.cmd == "subsample":
        print(subsample_frames(args.frames, args.out, args.keep_every))
    elif args.cmd == "remove_empty":
        print(remove_empty_frames(args.frames, args.out, args.threshold))
    elif args.cmd == "cityscapes":
        print(cityscapes_crop_resize(args.indir, args.out, args.size))
    elif args.cmd == "bair":
        print(convert_bair_tfrecords(args.tfrecords, args.out))
    elif args.cmd == "unzip":
        extract_zip(args.zip, args.out)


if __name__ == "__main__":
    main(sys.argv[1:])
