"""Image output (PPM/PNG/HDR) and texture loading.

Replaces the reference's stb_image / stb_image_write usage
(/root/reference/orion/raytracer.cpp:240-303, orion/texture.hpp:33-70).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def save_ppm(path: str | Path, image: np.ndarray) -> None:
    """Binary P6 PPM; per-channel clamp to 1 then scale by 255.

    Matches RayTracer::savePPM (raytracer.cpp:240-253).
    """
    image = np.asarray(image, np.float32)
    h, w = image.shape[:2]
    data = (np.minimum(image, 1.0) * 255.0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(data[:, :, :3].tobytes())


def save_png(path: str | Path, image: np.ndarray, normalize: bool = True) -> None:
    """RGBA PNG. When `normalize`, scale the whole image by 1/max-channel first.

    Matches RayTracer::savePNG's global max-normalization (raytracer.cpp:255-286).
    """
    from PIL import Image

    image = np.asarray(image, np.float32)
    scale = 1.0
    if normalize:
        # divide by the ACTUAL max channel, matching the reference — it
        # brightens dark renders to full range (raytracer.cpp:264-271
        # starts maxi at 0 and divides unconditionally). Sole deviation:
        # an all-black image divides by 0 there; we guard it to identity.
        maxi = float(np.max(image)) if image.size else 0.0
        scale = 1.0 / maxi if maxi > 0.0 else 1.0
    rgba = np.zeros((*image.shape[:2], 4), np.uint8)
    rgba[:, :, :3] = (np.minimum(image[:, :, :3] * scale, 1.0) * 255.0).astype(np.uint8)
    rgba[:, :, 3] = 255
    Image.fromarray(rgba, "RGBA").save(str(path))


def save_hdr(path: str | Path, image: np.ndarray) -> None:
    """Radiance RGBE `.hdr` (32-bit_rle_rgbe header, flat/uncompressed scanlines).

    Matches RayTracer::saveHDR's output format (raytracer.cpp:288-303, via
    stb_image_write); we emit non-RLE scanlines, which every HDR reader accepts.
    """
    image = np.asarray(image, np.float32)
    h, w = image.shape[:2]
    rgb = np.maximum(image[:, :, :3], 0.0)
    maxc = np.max(rgb, axis=2)
    # rgbe encoding
    with np.errstate(divide="ignore"):
        exp = np.where(maxc > 1e-32, np.ceil(np.log2(np.maximum(maxc, 1e-38))) + 1, 0)
    scale = np.where(maxc > 1e-32, np.exp2(-exp) * 256.0, 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    mantissa = np.clip(rgb * scale[:, :, None], 0, 255).astype(np.uint8)
    rgbe[:, :, :3] = mantissa
    rgbe[:, :, 3] = np.where(maxc > 1e-32, exp + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\n# Made with orion_tpu\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def load_hdr(path: str | Path) -> np.ndarray:
    """Read back a flat (non-RLE) Radiance `.hdr` written by save_hdr."""
    with open(path, "rb") as f:
        data = f.read()
    # split header from pixels
    idx = data.find(b"\n\n")
    header_end = data.find(b"\n", idx + 2)
    dims = data[idx + 2 : header_end].split()
    h, w = int(dims[1]), int(dims[3])
    rgbe = np.frombuffer(data[header_end + 1 :], np.uint8).reshape(h, w, 4)
    exp = rgbe[:, :, 3].astype(np.int32) - 128
    scale = np.where(rgbe[:, :, 3] > 0, np.exp2(exp.astype(np.float32)) / 256.0, 0.0)
    return rgbe[:, :, :3].astype(np.float32) * scale[:, :, None]


def save_image(path: str | Path, image: np.ndarray) -> None:
    """Dispatch on extension like traceRTC does (raytracer.cpp:92-102)."""
    ext = Path(path).suffix.lower()
    if ext == ".ppm":
        save_ppm(path, image)
    elif ext == ".png":
        save_png(path, image)
    else:
        save_hdr(path, image)


def load_texture(path: str | Path) -> np.ndarray:
    """Decode an image file to a float32 [H, W, 3] array in [0, 1].

    Matches Texture::loadFromFile (texture.hpp:33-70): 1-channel is
    broadcast to RGB, alpha is dropped, values normalized by /255.
    """
    from PIL import Image

    img = Image.open(str(path))
    if img.mode not in ("RGB", "RGBA", "L"):
        img = img.convert("RGB")
    arr = np.asarray(img)
    if arr.ndim == 2:  # grayscale
        arr = np.stack([arr] * 3, axis=-1)
    arr = arr[:, :, :3]
    return arr.astype(np.float32) / 255.0
