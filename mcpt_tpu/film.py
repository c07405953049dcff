"""Film: accumulation buffer → display-referred PNG.

Reference: framebuffer mean over spp (`src/Renderer.cpp:80`), gamma 0.45 and
8-bit quantization (`src/Renderer.cpp:96-103`), RGBA PNG output
(`src/Renderer.cpp:104-105`).
"""

import numpy as np

from mcpt_tpu.constants import INV_GAMMA
from mcpt_tpu.io.png import write_png


def tonemap(framebuffer: np.ndarray) -> np.ndarray:
    """(H,W,3) linear float → (H,W,4) uint8 RGBA with gamma 0.45."""
    fb = np.asarray(framebuffer, dtype=np.float32)
    out = np.clip(255.0 * np.power(np.maximum(fb, 0.0), INV_GAMMA), 0.0, 255.0)
    rgba = np.concatenate(
        [out.astype(np.uint8), np.full((*out.shape[:2], 1), 255, np.uint8)],
        axis=2,
    )
    return rgba


def save_png(path, framebuffer: np.ndarray) -> None:
    write_png(path, tonemap(framebuffer))
