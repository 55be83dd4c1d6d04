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
from typing import Optional

import numpy as np

import jax.numpy as jnp

from sift3d.core.config import DEFAULT_CONFIG, SiftConfig
from sift3d.core.featureset import (
    INFO_FLAG_MIN0MAX1,
    INFO_FLAG_REORIENT,
    FeatureSet,
)
from sift3d.pipeline import features as fstage
from sift3d.pipeline import pyramid
from sift3d.utils.timing import StageTimer


def _pad_to(arr: np.ndarray, n: int, fill=0):
    if arr.shape[0] == n:
        return arr
    pad = np.full((n - arr.shape[0],) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


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
            mask = np.asarray(res.mask)
            lvls0, zs, ys, xs = np.nonzero(mask)
            if lvls0.size == 0:
                continue
            signs = mask[lvls0, zs, ys, xs].astype(np.int32)
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

            with timer.stage(f"octave{octave}/gather"):
                xyz, scale, keep, patches = fstage.gather_stage(
                    res.gstack, res.dogs, jnp.asarray(c_lvl), jnp.asarray(c_zyx),
                    jnp.asarray(c_valid), sigmas,
                )
            with timer.stage(f"octave{octave}/orient"):
                o = fstage.orient_stage(patches, cfg)

            keep_np = np.asarray(keep) & np.asarray(o["eig_keep"])
            if not keep_np.any():
                continue
            kept = np.nonzero(keep_np)[0]

            xyz_np = np.asarray(xyz)[kept]
            scale_np = np.asarray(scale)[kept]
            eigs_np = np.asarray(o["eigs"])[kept]
            eig_ori_np = np.asarray(o["eig_ori"])[kept]
            ori_np = np.asarray(o["ori"])[kept]  # [K, K1, K2, 3, 3]
            ov_np = np.asarray(o["ori_valid"])[kept]  # [K, K1, K2]
            sign_np = c_sign[kept]
            lvl_np = c_lvl[kept]

            # ---- assemble output rows: unoriented + up to max_orientations
            rows_xyz, rows_scale, rows_eigs, rows_ori, rows_info = [], [], [], [], []
            # which patch to describe: (source, idx) source 0 = identity
            # patch from gather stage, 1 = resampled rotated patch
            resample_centers, resample_scales, resample_oris, resample_lvls = [], [], [], []
            patch_src = []  # (0, kept_idx) or (1, resample_idx)

            for i in range(len(kept)):
                base_info = INFO_FLAG_MIN0MAX1 if sign_np[i] > 0 else 0
                rows_xyz.append(xyz_np[i])
                rows_scale.append(scale_np[i])
                rows_eigs.append(eigs_np[i])
                rows_ori.append(eig_ori_np[i])
                rows_info.append(base_info)  # REORIENT cleared
                patch_src.append((0, kept[i]))
                if not reoriented:
                    continue
                emitted = 0
                kk1, kk2 = ov_np.shape[1:]
                for s1 in range(kk1):
                    for s2 in range(kk2):
                        if emitted >= cfg.max_orientations:
                            break
                        if not ov_np[i, s1, s2]:
                            continue
                        rows_xyz.append(xyz_np[i])
                        rows_scale.append(scale_np[i])
                        rows_eigs.append(eigs_np[i])
                        rows_ori.append(ori_np[i, s1, s2])
                        rows_info.append(base_info | INFO_FLAG_REORIENT)
                        patch_src.append((1, len(resample_centers)))
                        resample_centers.append(xyz_np[i])
                        resample_scales.append(scale_np[i])
                        resample_oris.append(ori_np[i, s1, s2])
                        resample_lvls.append(lvl_np[i])
                        emitted += 1

            if not rows_xyz:
                continue

            # ---- rotated patches for reoriented rows
            if resample_centers:
                with timer.stage(f"octave{octave}/resample"):
                    rc = np.asarray(resample_centers, dtype=np.float32)
                    rs = np.asarray(resample_scales, dtype=np.float32)
                    ro = np.asarray(resample_oris, dtype=np.float32)
                    rl = np.asarray(resample_lvls, dtype=np.int32)
                    m = rc.shape[0]
                    mp = int(np.ceil(m / chunk) * chunk)
                    rot_patches = []
                    for s0 in range(0, mp, chunk):
                        e0 = min(s0 + chunk, m)
                        rot_patches.append(
                            np.asarray(
                                fstage.resample_stage(
                                    res.gstack,
                                    jnp.asarray(_pad_to(rc[s0:e0], chunk)),
                                    jnp.asarray(_pad_to(rs[s0:e0], chunk, fill=1)),
                                    jnp.asarray(
                                        _pad_to(ro[s0:e0], chunk, fill=0)
                                        + np.concatenate(
                                            [
                                                np.zeros((e0 - s0, 3, 3), np.float32),
                                                np.tile(np.eye(3, dtype=np.float32), (chunk - (e0 - s0), 1, 1)),
                                            ]
                                        )
                                    ),
                                    jnp.asarray(_pad_to(rl[s0:e0], chunk, fill=1)),
                                )
                            )[: e0 - s0]
                        )
                    rot_patches = np.concatenate(rot_patches, axis=0)

            # ---- descriptors
            gather_patches = np.asarray(patches)
            all_patches = np.stack(
                [
                    gather_patches[idx] if src == 0 else rot_patches[idx]
                    for (src, idx) in patch_src
                ]
            )
            with timer.stage(f"octave{octave}/descriptor"):
                n_rows = all_patches.shape[0]
                np_pad = int(np.ceil(n_rows / chunk) * chunk)
                descs = []
                for s0 in range(0, np_pad, chunk):
                    e0 = min(s0 + chunk, n_rows)
                    block = _pad_to(all_patches[s0:e0], chunk)
                    descs.append(np.asarray(fstage.descriptor_stage(jnp.asarray(block), descriptor))[: e0 - s0])
                desc = np.concatenate(descs, axis=0)

            out_sets.append(
                FeatureSet(
                    xyz=np.asarray(rows_xyz, np.float32) * factor,
                    scale=np.asarray(rows_scale, np.float32) * factor,
                    ori=np.asarray(rows_ori, np.float32),
                    eigs=np.asarray(rows_eigs, np.float32),
                    info=np.asarray(rows_info, np.uint32),
                    desc=desc.astype(np.float32),
                )
            )

    return FeatureSet.concatenate(out_sets)
