"""PGM debug slice writer — successor of PpImageFloatOutput::output_float
(src_common/PpImageFloatOutput.h:19-24): normalize a float 2D slice to
8-bit and write binary PGM, used for eyeballing blur correctness
(MultiScale.cpp:305-313)."""

from __future__ import annotations

import numpy as np


def write_pgm(path: str, img: np.ndarray) -> None:
    img = np.asarray(img, dtype=np.float64)
    lo, hi = float(img.min()), float(img.max())
    scale = 255.0 / (hi - lo) if hi > lo else 0.0
    data = ((img - lo) * scale).astype(np.uint8)
    h, w = data.shape
    with open(path, "wb") as f:
        f.write(f"P5\n{w} {h}\n255\n".encode())
        f.write(data.tobytes())


def write_volume_slice(path: str, vol, z: int | None = None) -> None:
    """Write the middle (or given) XY slice of a [Z, Y, X] volume."""
    vol = np.asarray(vol)
    if z is None:
        z = vol.shape[0] // 2
    write_pgm(path, vol[z])
