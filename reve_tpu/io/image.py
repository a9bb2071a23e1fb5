"""Single-image channel semantics: grayscale / alpha / 16-bit handling.

The engine this framework replaces (realesrgan-ncnn-vulkan, spawned at
reve-shared/src/lib.rs:134-147 and reve-gui commands.rs:52-64) upscales
still images with channel layouts the video path never sees: grayscale,
RGBA (alpha upscaled through the model — the upstream Real-ESRGAN
inference convention, `--alpha_upsampler realesrgan`), and 16-bit PNGs.
The model itself is RGB-only, so every layout is routed through the
3-channel engine:

  * grayscale   -> replicated to 3 channels; output converted back to
                   single-channel luma (upstream `img_mode == 'L'` rule)
  * BGRA        -> color planes through the model; the alpha plane is
                   replicated to 3 channels, upscaled through the SAME
                   model, and reduced back to one channel
  * 16-bit      -> reduced to 8-bit for the u8-native engine (the engine
                   quantizes to u8 on device for HBM-bandwidth reasons,
                   pipeline/engine.py) and written back as 16-bit so the
                   container depth survives; a note is printed because
                   the low byte's precision does not

Everything here is host-side numpy around `UpscaleEngine.upscale_frames`;
the engine (and with it --tta, --dtype, tiling) is untouched.
"""

from __future__ import annotations

import os
import sys
from typing import Optional, Tuple

import numpy as np

#: output encodings that can carry an alpha plane (cv2.imwrite)
ALPHA_EXTS = (".png", ".webp")
#: output encodings that can carry 16-bit samples (cv2.imwrite); writing
#: a widened u16 array to any other encoder saturate-casts to white
SIXTEEN_BIT_EXTS = (".png",)


def classify(img: np.ndarray) -> str:
    """cv2.IMREAD_UNCHANGED result -> 'gray' | 'bgr' | 'bgra'."""
    if img.ndim == 2:
        return "gray"
    if img.ndim == 3 and img.shape[2] == 3:
        return "bgr"
    if img.ndim == 3 and img.shape[2] == 4:
        return "bgra"
    raise ValueError(f"unsupported image shape {img.shape}")


def to_u8(img: np.ndarray) -> Tuple[np.ndarray, bool]:
    """Reduce a decoded image to uint8; returns (u8 image, was_16bit)."""
    if img.dtype == np.uint8:
        return img, False
    if img.dtype == np.uint16:
        # round-to-nearest /257 (65535 -> 255 exactly)
        return ((img.astype(np.uint32) + 128) // 257).astype(np.uint8), True
    raise ValueError(f"unsupported image dtype {img.dtype}")


def _luma(bgr: np.ndarray) -> np.ndarray:
    """BGR u8 -> single-channel u8 (cv2 BGR2GRAY; import-free)."""
    b, g, r = (bgr[..., i].astype(np.float32) for i in range(3))
    return np.clip(np.rint(0.114 * b + 0.587 * g + 0.299 * r),
                   0, 255).astype(np.uint8)


def _through_model(engine, rgb: np.ndarray) -> np.ndarray:
    return engine.upscale_frames(np.ascontiguousarray(rgb)[None])[0]


def upscale_image_array(engine, img: np.ndarray,
                        note=None) -> Tuple[np.ndarray, bool]:
    """Upscale one decoded (cv2.IMREAD_UNCHANGED, BGR byte order) image
    through `engine`, preserving its channel layout.

    Returns (output image in the INPUT's layout/byte order, was_16bit).
    `note(msg)` is called for user-facing degradation notes (16-bit
    reduction); defaults to stderr.
    """
    if note is None:
        note = lambda msg: print(msg, file=sys.stderr)  # noqa: E731
    img, was_16bit = to_u8(img)
    if was_16bit:
        note("note: 16-bit input reduced to 8-bit for the u8-native "
             "engine")
    mode = classify(img)
    if mode == "gray":
        rgb = np.repeat(img[:, :, None], 3, axis=2)
        out = _through_model(engine, rgb)
        return _luma(out[:, :, ::-1]), was_16bit
    if mode == "bgr":
        out = _through_model(engine, img[:, :, ::-1])
        return out[:, :, ::-1], was_16bit
    # bgra: color and alpha each through the model
    out_bgr = _through_model(engine, img[:, :, 2::-1])[:, :, ::-1]
    alpha3 = np.repeat(img[:, :, 3:4], 3, axis=2)
    out_alpha = _luma(_through_model(engine, alpha3)[:, :, ::-1])
    return np.dstack([out_bgr, out_alpha]), was_16bit


def to_output_depth(out: np.ndarray, was_16bit: bool) -> np.ndarray:
    """Widen an 8-bit result back to the input's bit depth for imwrite."""
    if was_16bit:
        return out.astype(np.uint16) * 257  # 255 -> 65535 exactly
    return out


def alpha_ok(output_path: str) -> bool:
    return output_path.lower().endswith(ALPHA_EXTS)


def upscale_image_file(engine, in_path: str, out_path: str,
                       img: Optional[np.ndarray] = None, note=None):
    """Decode -> engine -> encode one image file; the one shared per-file
    pipeline behind the CLI's single/dir modes and api.upscale_image.

    Returns (error_message_or_None, (width, height)_or_None).  Pass a
    pre-decoded `img` (cv2.IMREAD_UNCHANGED) to skip the decode.  16-bit
    inputs are re-widened only for extensions that can carry 16 bits
    (SIXTEEN_BIT_EXTS) — any other encoder would saturate the u16 values
    to white; those outputs stay 8-bit with a note.  Alpha-vs-extension
    must be validated by the caller (the modes report it differently).
    """
    import cv2

    if note is None:
        note = lambda msg: print(msg, file=sys.stderr)  # noqa: E731
    if img is None:
        img = cv2.imread(in_path, cv2.IMREAD_UNCHANGED)
    if img is None:
        return f"cannot decode image {in_path!r}", None
    try:
        out, was_16bit = upscale_image_array(engine, img, note=note)
    except ValueError as e:
        return str(e), None
    if was_16bit:
        if out_path.lower().endswith(SIXTEEN_BIT_EXTS):
            out = to_output_depth(out, True)
            note("note: output written as 16-bit")
        else:
            ext = os.path.splitext(out_path)[1]
            note(f"note: {ext} cannot carry 16-bit samples; output "
                 f"written as 8-bit (use .png to keep 16-bit)")
    if not cv2.imwrite(out_path, np.ascontiguousarray(out)):
        return f"cannot write image {out_path!r}", None
    h, w = out.shape[:2]
    return None, (w, h)
