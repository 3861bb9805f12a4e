"""Dataset streams: generators yielding (t, image, depth, depth_gt, intrinsics).

Mirror of main/stream.py:39-327 — Sintel (.cam/.dpt binary readers),
TartanAir, DAVIS (per-frame K .npy), and generic directory streams. Frames
are cropped to multiples of 16 and terminated with a t = -1 sentinel, exactly
as the reference CLI expects (run_batrack.py:55-57).
"""

from __future__ import annotations

import os
from itertools import chain
from pathlib import Path
from typing import Iterator, Tuple

import numpy as np

TAG_FLOAT = 202021.25
TUM_SCALING = 5000.0

IMG_EXTS = ["*.png", "*.jpeg", "*.jpg"]


def _imread_rgb(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(str(path))
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def _glob_sorted(d: str, exts) -> list:
    return sorted(chain.from_iterable(Path(d).glob(e) for e in exts))


def cam_read_sintel(filename: str):
    """Sintel .cam: (K (3,3), extrinsic (3,4)) (stream.py:23-37)."""
    with open(filename, "rb") as f:
        check = np.fromfile(f, dtype=np.float32, count=1)[0]
        assert check == TAG_FLOAT, f"bad .cam tag {check}"
        M = np.fromfile(f, dtype="float64", count=9).reshape((3, 3))
        N = np.fromfile(f, dtype="float64", count=12).reshape((3, 4))
    return M, N


def sintel_depth_read(filename: str) -> np.ndarray:
    """Sintel .dpt binary depth (stream.py:77-87)."""
    with open(filename, "rb") as f:
        check = np.fromfile(f, dtype=np.float32, count=1)[0]
        assert check == TAG_FLOAT, f"bad .dpt tag {check}"
        width = np.fromfile(f, dtype=np.int32, count=1)[0]
        height = np.fromfile(f, dtype=np.int32, count=1)[0]
        depth = np.fromfile(f, dtype=np.float32, count=-1).reshape((height, width))
    return depth


def tum_depth_read(filename: str) -> np.ndarray:
    from PIL import Image

    return np.array(Image.open(filename)) / TUM_SCALING


def load_depth_file(filename: str, mode: str = "sintel") -> np.ndarray:
    """Dispatch on extension (stream.py:89-102)."""
    filename = str(filename)
    if filename.endswith(".npy"):
        depth = np.load(filename)
    elif filename.endswith(".npz"):
        depth = np.load(filename)["depth"]
    elif mode == "sintel":
        depth = sintel_depth_read(filename)
    elif mode in ("tum", "tartanair"):
        depth = tum_depth_read(filename)
    else:
        raise NotImplementedError(filename)
    if depth.ndim == 2:
        depth = depth[..., None]
    return depth.astype(float)


def _crop16(img: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    return img[: h - h % 16, : w - w % 16]


def sintel_rgbd_stream(
    imagedir, depthdir, depthdir_gt, calib_root, stride=1, skip=0, end=-1,
    input_intrinsics=False,
) -> Iterator[Tuple]:
    """(stream.py:105-173). `end` is honored for every list — the reference
    applies it only to the Ks (stream.py:124-127) while slicing images
    [skip::stride], which desynchronizes gt-trajectory truncation from the
    processed frames; the intent (and the davis stream) bound everything."""
    stop = None if end == -1 else end
    image_list = _glob_sorted(imagedir, IMG_EXTS)[skip:stop:stride]
    depth_list = _glob_sorted(depthdir, ["*.npy", "*.npz"])[skip:stop:stride]
    depth_list_gt = _glob_sorted(depthdir_gt, ["*.dpt"])[skip:stop:stride]
    assert len(depth_list) == len(image_list)

    Ks = None
    if input_intrinsics:
        K_list = _glob_sorted(calib_root, ["*.npy"])
        Ks = np.array([np.load(str(k)) for k in K_list])
        if end == -1:
            end = len(image_list)
        Ks = Ks[skip:end:stride]

    frame = None
    for t, imfile in enumerate(image_list):
        image = _imread_rgb(imfile)
        if Ks is not None:
            K = Ks[0]
        else:
            camfile = os.path.join(
                calib_root, os.path.basename(str(imfile)).replace(".png", ".cam")
            )
            K, _ = cam_read_sintel(camfile)
        intrinsics = np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]])
        image = _crop16(image)
        depth = _crop16(load_depth_file(depth_list[t]))
        if depth.shape[:2] != image.shape[:2]:
            import cv2

            depth = cv2.resize(
                depth, (image.shape[1], image.shape[0]),
                interpolation=cv2.INTER_NEAREST,
            )[..., None]
        depth_gt = _crop16(load_depth_file(depth_list_gt[t], mode="sintel"))
        frame = (t, image, depth, depth_gt, intrinsics)
        yield frame
    if frame is not None:  # no sentinel for an empty stream (clear error upstream)
        yield (-1,) + frame[1:]


def tartanair_rgbd_stream(
    imagedir, depthdir, depthdir_gt, calib_root, stride=1, skip=0, end=-1
) -> Iterator[Tuple]:
    """(stream.py:176-226); `end` honored (see sintel_rgbd_stream note)."""
    calib = np.loadtxt(calib_root, delimiter=" ")
    intrinsics = np.array(calib[:4])

    stop = None if end == -1 else end
    image_list = _glob_sorted(imagedir, IMG_EXTS)[skip:stop:stride]
    depth_list = _glob_sorted(depthdir, ["*.npy", "*.npz"])[skip:stop:stride]
    depth_list_gt = _glob_sorted(depthdir_gt, ["*.npy"])[skip:stop:stride]
    assert len(depth_list) == len(image_list)

    frame = None
    for t, imfile in enumerate(image_list):
        timestamp = Path(str(imfile)).stem
        image = _crop16(_imread_rgb(imfile))
        depth = _crop16(load_depth_file(depth_list[t]))
        depth_gt = _crop16(load_depth_file(depth_list_gt[t], mode="tartanair"))
        frame = (timestamp, image, depth, depth_gt, intrinsics)
        yield frame
    if frame is not None:  # no sentinel for an empty stream (clear error upstream)
        yield (-1,) + frame[1:]


def davis_stream(imagedir, depthdir, calib_root, stride=1, skip=0, end=-1):
    """(stream.py:231-280): per-frame K matrices from the alignment stage."""
    image_list = _glob_sorted(imagedir, IMG_EXTS)
    depth_list = _glob_sorted(depthdir, ["*.npy"])
    K_list = _glob_sorted(calib_root, ["*.npy"])
    Ks = np.array([np.load(str(k)) for k in K_list])
    if end == -1:
        end = len(image_list)
    Ks = Ks[skip:end:stride]
    image_list = image_list[skip:end:stride]
    depth_list = depth_list[skip:end:stride]
    assert len(depth_list) == len(image_list) == Ks.shape[0]

    frame = None
    for t, imfile in enumerate(image_list):
        image = _crop16(_imread_rgb(imfile))
        intrinsics = np.array([Ks[t, 0, 0], Ks[t, 1, 1], Ks[t, 0, 2], Ks[t, 1, 2]])
        depth = _crop16(load_depth_file(depth_list[t]))
        frame = (t, image, depth, depth, intrinsics)
        yield frame
    if frame is not None:  # no sentinel for an empty stream (clear error upstream)
        yield (-1,) + frame[1:]


def dataset_rgbd_stream(imagedir, depthdir, calib, stride=1, skip=0, end=-1,
                        mode="replica"):
    """Generic fixed-K stream (stream.py:284-327); `end` honored."""
    calib = np.loadtxt(calib, delimiter=" ")
    intrinsics = np.array(calib[:4])
    stop = None if end == -1 else end
    image_list = _glob_sorted(imagedir, IMG_EXTS)[skip:stop:stride]
    depth_list = _glob_sorted(depthdir, ["*.npy"])[skip:stop:stride]
    assert len(depth_list) == len(image_list)

    frame = None
    for t, imfile in enumerate(image_list):
        image = _crop16(_imread_rgb(imfile))
        depth = _crop16(load_depth_file(depth_list[t]))
        frame = (t, image, depth, depth, intrinsics)
        yield frame
    if frame is not None:  # no sentinel for an empty stream (clear error upstream)
        yield (-1,) + frame[1:]


def native_rgbd_stream(
    image_paths, depth_paths, intrinsics_fn, num_threads: int = 3
) -> Iterator[Tuple]:
    """Prefetched RGB-D stream backed by the native C++ loader.

    intrinsics_fn(t) -> (4,) per-frame intrinsics. Yields the same tuples as
    the Python streams (depth_gt = depth) with decode/crop/clip running in
    background threads, and the -1 sentinel at the end.
    """
    from batrack_tpu.data.native_loader import PrefetchLoader

    loader = PrefetchLoader(list(map(str, image_paths)), list(map(str, depth_paths)),
                            num_threads=num_threads)
    frame = None
    for idx, image, depth in loader:
        d = depth[..., None].astype(float)
        frame = (idx, image, d, d, np.asarray(intrinsics_fn(idx)))
        yield frame
    loader.close()
    if frame is not None:  # no sentinel for an empty stream (clear error upstream)
        yield (-1,) + frame[1:]
