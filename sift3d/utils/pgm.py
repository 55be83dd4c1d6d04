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


def write_pyramid_slices(data, cfg, initial_image_scale: float = 1.0,
                         prefix: str = "image") -> list:
    """Per-octave mid-pyramid blur-slice dumps (debug eyeball check).

    The reference writes the first blur level's mid XY slice during the
    pyramid (MultiScale.cpp:374-384) — but always to the same
    'image.pgm', so only octave 0 survives on disk (the `if (i==0)`
    guard). Here every octave's G1 slice gets its own file
    `{prefix}_o{N}.pgm`, which is the check the reference author
    actually uses, kept for all octaves. Recomputes the (cheap) first
    half of each octave's blur chain outside the jitted pipeline — this
    is a debug path, not a pipeline tap.

    Returns the list of paths written.
    """
    from sift3d.core.config import DEFAULT_CONFIG
    from sift3d.kernels import gauss
    from sift3d.kernels.resample import subsample_2x
    from sift3d.pipeline.pyramid import initial_blur_core, num_octaves

    cfg = cfg or DEFAULT_CONFIG
    inc = cfg.incremental_sigmas()
    base = initial_blur_core(data, cfg, initial_image_scale)
    paths = []
    for octave in range(num_octaves(data.shape, cfg)):
        levels = [base]
        for j in range(1, cfg.blurs_per_octave + 1):
            levels.append(gauss.blur3d(levels[-1], inc[j - 1], cfg.blur_precision,
                                       matmul_precision=cfg.blur_matmul_precision))
        path = f"{prefix}_o{octave}.pgm"
        write_volume_slice(path, np.asarray(levels[1]))
        paths.append(path)
        base = subsample_2x(levels[cfg.blurs_per_octave])
    return paths
