"""Image I/O and dtype/layout conversion.

Parity targets in the reference: ``python/imageProcess.py:216-302``
(``toNumPy/toBuffer/toFloat/toOutput/toTorch/readFile/writeFile``) and
``:350-368,561`` (alpha extract/merge/dedupe).  Unlike the reference
(CHW torch tensors), every device image here is **HWC float32/bf16 in
[0, 1]** — channels-last is the natural TPU layout (channels ride the
128-wide lane dimension).
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import numpy as np

try:  # Pillow is present in the image; keep the import soft for bare CI
    from PIL import Image
except Exception:  # pragma: no cover
    Image = None


def npDtypeFor(bitDepth: int):
    if bitDepth <= 8:
        return np.uint8
    if bitDepth <= 16:
        return np.uint16
    return np.int32


def toFloat(image: np.ndarray, bitDepth: int = 8) -> np.ndarray:
    """Integer HWC image -> float32 HWC in [0, 1) (quant = 1 << bits)."""
    quant = 1 << bitDepth
    return np.asarray(image, dtype=np.float32) / quant


def toOutput(image, bitDepth: int = 8) -> np.ndarray:
    """Float HWC in [0, 1] -> integer HWC (reference ``toOutput`` :245-257)."""
    quant = 1 << bitDepth
    if bitDepth <= 8:
        dtype = np.uint8
    elif bitDepth <= 15:
        dtype = np.int16
    else:
        dtype = np.int32
    arr = np.asarray(image, dtype=np.float32) * quant
    np.clip(arr, 0, quant - 1, out=arr)
    return arr.astype(dtype)


def toBuffer(image: Optional[np.ndarray], bitDepth: int = 16) -> Optional[bytes]:
    """Integer HWC image -> raw bytes for the encode pipe (``toBuffer`` :231-236)."""
    if image is None:
        return None
    return np.ascontiguousarray(image.astype(npDtypeFor(bitDepth))).tobytes()


def fromBuffer(buffer, height: int, width: int, bitDepth: int = 16) -> Optional[np.ndarray]:
    """Raw frame bytes -> float HWC in [0, 1) (``toNumPy`` + ``toTorch``
    fused; 3 channels assumed).  16-bit frames go through the native
    multithreaded codec (``native/framecodec.cpp``)."""
    if not buffer:
        return None
    if bitDepth == 16:
        from moephoto_tpu import native

        return native.u16FrameToFloat(buffer, height, width)
    arr = np.frombuffer(buffer, dtype=npDtypeFor(bitDepth))
    return arr.reshape((height, width, 3)).astype(np.float32) / (1 << bitDepth)


BGR2RGB = lambda im: im[..., ::-1]


def dedupeAlpha(x: np.ndarray) -> Tuple[str, np.ndarray]:
    """Drop an all-opaque alpha channel (reference ``dedupeAlpha`` :561)."""
    if float(np.sum(255 - x[:, :, 3].astype(np.float32))) < 1:
        return "RGB", x[:, :, :3]
    return "RGBA", x


def extractAlpha(t: dict):
    """Split trailing alpha channel off an HWC image; stash it in ``t``."""

    def f(im):
        if im.shape[-1] == 4:
            t["im"] = im[..., 3:]
            return im[..., :3]
        return im

    return f


def mergeAlpha(t: dict):
    """Re-attach a stashed alpha channel, resizing if the image was scaled."""

    def f(im):
        if not t:
            return im
        alpha = np.asarray(t["im"], dtype=np.float32)
        if alpha.shape[:2] != im.shape[:2]:
            alpha = resizeNearest(alpha, im.shape[0], im.shape[1])
        return np.concatenate([np.asarray(im), alpha], axis=-1)

    return f


def resizeNearest(im: np.ndarray, h: int, w: int) -> np.ndarray:
    ys = (np.arange(h) * im.shape[0] / h).astype(np.int64)
    xs = (np.arange(w) * im.shape[1] / w).astype(np.int64)
    return im[ys][:, xs]


def readFile(file, context=None) -> np.ndarray:
    """Read an image file/stream to an HWC uint array.

    Follows reference ``readFile`` (``imageProcess.py:278-302``): palette
    images are converted to RGB (palette kept on ``context`` for P-mode
    round trips), all-opaque RGBA collapses to RGB, grayscale becomes
    (H, W, 1).
    """
    image = Image.open(file)
    mode = image.mode
    if context is not None:
        context.imageMode = mode
    if mode == "P":
        if context is not None:
            context.palette = image
        image = image.convert("RGB")
    arr = np.array(image)
    if mode == "RGBA":
        newMode, arr = dedupeAlpha(arr)
        if context is not None:
            context.imageMode = newMode
    if arr.ndim == 2:
        return arr.reshape(*arr.shape, 1)
    if arr.shape[2] in (3, 4):
        return arr
    raise RuntimeError("Unknown image format")


def writeFile(image: np.ndarray, name, context=None, *args):
    """Write an HWC integer image (reference ``writeFile`` :265-276)."""
    if not name:
        name = genNameByTime()
    elif hasattr(name, "seek"):
        name.seek(0)
    if image.shape[2] == 1:
        image = image[..., 0]
    pil = Image.fromarray(image)
    if context is not None and getattr(context, "imageMode", None) == "P":
        pil = pil.quantize(palette=context.palette)
    pil.save(name, *args)
    return name


outDir = "download"
genNameByTime = lambda: "{}/output_{}.png".format(outDir, int(time.time()))
