"""Image file IO.

The reference used cv::imread/imwrite (multi_frame_sr.cpp:172,207-209,
polar_defog.cpp:80-87). We use PIL so the framework has no OpenCV
dependency; arrays are float32 RGB in [0, 1] (HWC), matching the
reference's ``convertTo(CV_32FC3, 1/255.0)`` normalization convention.
"""

from __future__ import annotations

import os
from typing import Union

import numpy as np

from PIL import Image

PathLike = Union[str, os.PathLike]


def imread(path: PathLike) -> np.ndarray:
    """Read an image as float32 RGB (HWC) in [0, 1]. Uses the native C++
    decoder (libpng/libjpeg, data/native.py) when built, PIL otherwise."""
    from multi_frame_super_resolution_tpu.data import native

    out = native.imread_native(os.fspath(path))
    if out is not None:
        return out
    with Image.open(path) as im:
        im = im.convert("RGB")
        arr = np.asarray(im, dtype=np.float32) / 255.0
    return arr


def imread_gray(path: PathLike) -> np.ndarray:
    """Read an image as float32 grayscale (HW) in [0, 1]."""
    from multi_frame_super_resolution_tpu.data import native

    out = native.imread_native(os.fspath(path), gray=True)
    if out is not None:
        return out
    with Image.open(path) as im:
        im = im.convert("L")
        arr = np.asarray(im, dtype=np.float32) / 255.0
    return arr


def imread_u16(path: PathLike) -> np.ndarray:
    """Read a 16-bit image (e.g. TIFF) as float32 in [0, 1].

    Mirrors the reference's IMREAD_ANYDEPTH + convertTo(1/65535) path
    (polar_defog.cpp:80-81,145-146). Uses the native decoder's baseline
    TIFF reader when built (native/mfsr_native.cpp::decode_tiff); PIL
    covers compressed TIFF variants.
    """
    from multi_frame_super_resolution_tpu.data import native

    meta = native.probe(os.fspath(path))
    if meta is not None:
        h, w, c, _bits = meta
        out = native.imread_native(os.fspath(path), gray=(c == 1))
        if out is not None:
            return out
    with Image.open(path) as im:
        arr = np.asarray(im)
    if arr.dtype == np.uint16:
        arr = arr.astype(np.float32) / 65535.0
    elif arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    else:
        arr = arr.astype(np.float32)
    return arr


def imwrite(path: PathLike, img: np.ndarray) -> None:
    """Write a float32 [0,1] (HW or HWC) image as 8-bit PNG/JPEG."""
    img = np.asarray(img)
    if img.dtype in (np.float32, np.float64):
        img = np.clip(img, 0.0, 1.0)
        img = (img * 255.0 + 0.5).astype(np.uint8)
    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[..., 0]
    Image.fromarray(img).save(path)
