"""Image / disparity / PFM I/O (reference myDatasets_stereo/img_rw.py,
img_rw_pfm.py).

Notable reference behavior kept: KITTI disparity PNGs are uint16 scaled
by 256, but the reference loads them through cv2's default 8-bit path,
implicitly dividing by 256 into integer-pixel disparities
(img_rw.py:23-29 — noted in SURVEY §2.4).  ``load_disp`` exposes a
``precise`` flag: False reproduces the reference, True reads the full
16-bit precision.
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

__all__ = ["imread", "imwrite", "load_disp", "load_pfm", "save_pfm"]


def load_pfm(fname: str):
    """PFM reader with endianness + vertical flip handling
    (img_rw_pfm.py:13-44)."""
    with open(fname, "rb") as f:
        header = f.readline().decode("latin-1").rstrip()
        if header == "PF":
            color = True
        elif header == "Pf":
            color = False
        else:
            raise ValueError(f"{fname}: not a PFM file")
        dims = f.readline().decode("latin-1")
        m = re.match(r"^(\d+)\s(\d+)\s*$", dims)
        if not m:
            raise ValueError(f"{fname}: malformed PFM header")
        width, height = map(int, m.groups())
        scale = float(f.readline().decode("latin-1").rstrip())
        endian = "<" if scale < 0 else ">"
        scale = abs(scale)
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape)).copy(), scale


def save_pfm(fname: str, image: np.ndarray, scale: float = 1.0) -> None:
    """PFM writer (img_rw_pfm.py:46-71)."""
    if image.dtype.name != "float32":
        raise ValueError("PFM image dtype must be float32")
    if image.ndim == 3 and image.shape[2] == 3:
        color = True
    elif image.ndim == 2 or (image.ndim == 3 and image.shape[2] == 1):
        color = False
    else:
        raise ValueError("image must be HxWx3, HxWx1 or HxW")
    endian = image.dtype.byteorder
    if endian == "<" or (endian == "=" and sys.byteorder == "little"):
        scale = -scale
    with open(fname, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode())
        f.write(f"{scale}\n".encode())
        np.flipud(image).tofile(f)


def imread(fname: str) -> np.ndarray:
    """RGB (H,W,3) uint8-ish float or PFM float array (img_rw.py:23-29)."""
    if ".pfm" in fname:
        return load_pfm(fname)[0]
    import cv2

    img = cv2.imread(fname)
    if img is None:
        raise IOError(f"cannot read image: {fname}")
    return np.ascontiguousarray(np.flip(img, axis=2))  # BGR -> RGB


def imwrite(fname: str, image: np.ndarray) -> None:
    if ".pfm" in fname:
        save_pfm(fname, image)
        return
    import cv2

    cv2.imwrite(fname, np.ascontiguousarray(np.flip(image, axis=2)))


def load_disp(fname: str, precise: bool = False) -> np.ndarray:
    """First-channel disparity with inf/nan zeroed (img_rw.py:12-21).

    ``precise=True`` reads 16-bit KITTI PNGs at full resolution /256
    instead of the reference's implicit 8-bit truncation."""
    if ".pfm" in fname:
        disp = load_pfm(fname)[0]
        if disp.ndim > 2:
            disp = disp[:, :, 0]
    elif precise and fname.endswith(".png"):
        import cv2

        raw = cv2.imread(fname, cv2.IMREAD_UNCHANGED)
        if raw is None:
            raise IOError(f"cannot read disparity: {fname}")
        if raw.ndim > 2:
            raw = raw[:, :, 0]
        disp = raw.astype(np.float32)
        if raw.dtype == np.uint16:
            disp /= 256.0
    else:
        img = imread(fname)
        disp = img[:, :, 0] if img.ndim > 2 else img
    disp = np.asarray(disp, np.float32).copy()
    disp[~np.isfinite(disp)] = 0.0
    return disp
