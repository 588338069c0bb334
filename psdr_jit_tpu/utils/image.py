"""Image IO without external deps.

The reference uses vendored tinyexr for EXR (``bitmap_loader.cpp``).  Here we
support ``.npy`` (preferred interchange), PFM (portable float map — a trivial
HDR format), and PPM for LDR previews.  EXR support can slot in later via a
small C extension.
"""

from __future__ import annotations

import struct

import numpy as np


def read_image(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.asarray(np.load(path), np.float32)
    if path.endswith(".pfm"):
        return read_pfm(path)
    if path.endswith(".exr"):
        from ..native import read_exr

        return read_exr(path)
    raise ValueError(
        f"Unsupported image format: {path} (use .exr, .npy or .pfm)"
    )


def write_image(path: str, img) -> None:
    img = np.asarray(img, np.float32)
    if path.endswith(".npy"):
        np.save(path, img)
    elif path.endswith(".pfm"):
        write_pfm(path, img)
    elif path.endswith(".ppm"):
        write_ppm(path, img)
    elif path.endswith(".exr"):
        from ..native import write_exr

        write_exr(path, img)
    else:
        raise ValueError(f"Unsupported image format: {path}")


def read_pfm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        header = f.readline().decode().strip()
        assert header in ("PF", "Pf"), "not a PFM file"
        channels = 3 if header == "PF" else 1
        w, h = map(int, f.readline().decode().split())
        scale = float(f.readline().decode().strip())
        data = np.fromfile(f, "<f4" if scale < 0 else ">f4")
        img = data.reshape(h, w, channels)
        return img[::-1].astype(np.float32)  # PFM is bottom-up


def write_pfm(path: str, img: np.ndarray) -> None:
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    channels = img.shape[-1]
    header = "PF" if channels == 3 else "Pf"
    with open(path, "wb") as f:
        f.write(f"{header}\n{img.shape[1]} {img.shape[0]}\n-1.0\n".encode())
        img[::-1].astype("<f4").tofile(f)


def write_ppm(path: str, img: np.ndarray, gamma: float = 2.2) -> None:
    img = np.asarray(img, np.float32)
    ldr = np.clip(img, 0.0, 1.0) ** (1.0 / gamma)
    ldr = (ldr * 255 + 0.5).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(f"P6\n{img.shape[1]} {img.shape[0]}\n255\n".encode())
        ldr.tofile(f)


def srgb(img, gamma: float = 2.2):
    return np.clip(np.asarray(img, np.float32), 0.0, 1.0) ** (1.0 / gamma)
