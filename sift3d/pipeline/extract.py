"""End-to-end feature extraction: the featExtract pipeline re-orchestrated.

Host-side octave loop driving the jitted device programs:

  initial_blur -> per octave: octave_step (blurs + DoGs + fused extrema)
               -> candidate extraction from the mask (tiny int8 transfer)
               -> gather_stage (refine + bounds + identity patches)
               -> orient_stage (eigen + canonical orientations)
               -> resample_stage (rotated patches)
               -> descriptor_stage (GoH/BRIEF + rank)

Feature geometry follows MultiScale.cpp:531-543: octave-local coordinates
(already +0.5 shifted) are scaled by 2^octave, as is the interpolated
scale (itself 2x the interpolated sigma).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from sift3d.core.config import DEFAULT_CONFIG, SiftConfig
from sift3d.core.featureset import FeatureSet
from sift3d.pipeline import features as fstage
from sift3d.pipeline import pyramid
from sift3d.utils.timing import StageTimer


def _pad_to(arr: np.ndarray, n: int, fill=0):
    if arr.shape[0] == n:
        return arr
    pad = np.full((n - arr.shape[0],) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


@functools.partial(jax.jit, static_argnames=("size",))
def _compact_mask(mask: jnp.ndarray, size: int):
    """Device-side extrema compaction: flat indices + signs + total count.

    Avoids transferring the full int8 mask volume to the host (tens of MB
    at T1 scale); only `size` indices plus signs cross the wire. The count
    lets the host detect overflow and fall back to a full transfer.
    """
    flat = mask.ravel()
    total = (flat != 0).sum()
    idx = jnp.nonzero(flat != 0, size=size, fill_value=-1)[0]
    sign = jnp.where(idx >= 0, flat[jnp.clip(idx, 0)], 0)
    return idx, sign, total


def _extract_candidates(res_mask, cap: int):
    """Returns (lvl0, zs, ys, xs, signs) numpy arrays from the device mask."""
    nl, zd, yd, xd = res_mask.shape
    size = min(cap, nl * zd * yd * xd)
    idx_d, sign_d, total_d = _compact_mask(res_mask, size)
    total = int(total_d)  # tiny blocking transfer
    if total > size:
        # overflow (extremely textured volume): full fallback transfer
        mask = np.asarray(res_mask)
        lvls0, zs, ys, xs = np.nonzero(mask)
        return lvls0, zs, ys, xs, mask[lvls0, zs, ys, xs].astype(np.int32)
    # download exactly `total` entries (device slice keeps the wire small)
    idx = np.asarray(idx_d[:total])
    sign = np.asarray(sign_d[:total]).astype(np.int32)
    lvls0, rem = np.divmod(idx, zd * yd * xd)
    zs, rem = np.divmod(rem, yd * xd)
    ys, xs = np.divmod(rem, xd)
    return lvls0, zs, ys, xs, sign


def extract_features(
    img,
    cfg: SiftConfig = DEFAULT_CONFIG,
    initial_image_scale: float = 1.0,
    descriptor: str = "goh",
    reoriented: bool = True,
    timer: Optional[StageTimer] = None,
) -> FeatureSet:
    """Extract 3D SIFT features from a [Z, Y, X] volume.

    Equivalent of msGeneratePyramidDOG3D_efficient + the per-feature
    descriptor loop in featExtract.cpp:409-539. Returns features in voxel
    coordinates of the input volume.
    """
    timer = timer or StageTimer(enabled=False)
    img = jnp.asarray(img, dtype=jnp.float32)
    sigmas = tuple(cfg.level_sigmas())

    with timer.stage("initial_blur"):
        base = pyramid.initial_blur(img, cfg, initial_image_scale)

    out_sets = []
    n_oct = pyramid.num_octaves(img.shape, cfg)
    for octave in range(n_oct):
        with timer.stage(f"octave{octave}/pyramid"):
            res = pyramid.octave_step(base, cfg)
        base = res.next_base

        with timer.stage(f"octave{octave}/candidates"):
            lvls0, zs, ys, xs, signs = _extract_candidates(
                res.mask, 8 * cfg.max_candidates_per_level
            )
            if lvls0.size == 0:
                continue
            dog_lvl = (lvls0 + 1).astype(np.int32)
            # reference emission order: per level, valleys then peaks,
            # scan order (generateFeatures3D_efficient loops)
            order = np.lexsort((xs, ys, zs, signs, dog_lvl))
            dog_lvl, zs, ys, xs, signs = (
                dog_lvl[order],
                zs[order].astype(np.int32),
                ys[order].astype(np.int32),
                xs[order].astype(np.int32),
                signs[order],
            )

        n_cand = dog_lvl.shape[0]
        chunk = cfg.feature_chunk
        factor = float(2.0**octave)
        for start in range(0, n_cand, chunk):
            end = min(start + chunk, n_cand)
            c_lvl = _pad_to(dog_lvl[start:end], chunk, fill=1)
            c_zyx = _pad_to(
                np.stack([zs[start:end], ys[start:end], xs[start:end]], axis=1), chunk, fill=1
            )
            c_sign = _pad_to(signs[start:end], chunk, fill=0)
            c_valid = np.zeros((chunk,), dtype=bool)
            c_valid[: end - start] = True

            c_lvl_d = jnp.asarray(c_lvl)
            c_sign_d = jnp.asarray(c_sign)
            with timer.stage(f"octave{octave}/gather"):
                xyz, scale, keep, patches = fstage.gather_stage(
                    res.gstack, res.dogs, c_lvl_d, jnp.asarray(c_zyx),
                    jnp.asarray(c_valid), sigmas,
                )
            with timer.stage(f"octave{octave}/orient"):
                o = fstage.orient_stage(patches, cfg)
            with timer.stage(f"octave{octave}/emit"):
                emit_cap = 4 * chunk
                count, r_xyz, r_scale, r_eigs, r_ori, r_info, r_patches = fstage.emit_stage(
                    res.gstack, c_lvl_d, xyz, scale,
                    keep & o["eig_keep"], c_sign_d,
                    o["eigs"], o["eig_ori"], o["ori"], o["ori_valid"],
                    cfg, emit_cap, reoriented,
                )
            with timer.stage(f"octave{octave}/descriptor"):
                r_desc = fstage.descriptor_stage(r_patches, descriptor).astype(jnp.uint8)

            # single small host transfer: `count` packed rows
            with timer.stage(f"octave{octave}/download"):
                n_rows = int(count)
                if n_rows == 0:
                    continue
                if n_rows > emit_cap:
                    print(
                        f"warning: octave {octave} chunk emitted {n_rows} rows, "
                        f"truncated to {emit_cap}"
                    )
                    n_rows = emit_cap
                out_sets.append(
                    FeatureSet(
                        xyz=np.asarray(r_xyz[:n_rows]) * factor,
                        scale=np.asarray(r_scale[:n_rows]) * factor,
                        ori=np.asarray(r_ori[:n_rows]),
                        eigs=np.asarray(r_eigs[:n_rows]),
                        info=np.asarray(r_info[:n_rows]),
                        desc=np.asarray(r_desc[:n_rows]).astype(np.float32),
                    )
                )

    return FeatureSet.concatenate(out_sets)
