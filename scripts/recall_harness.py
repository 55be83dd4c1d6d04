"""Keypoint repeatability + match recall under known similarity warps.

The BASELINE.json target: >= 0.9 match recall on T1-like volumes. This
harness synthesizes a volume, warps it by a known similarity transform
(rotation + scale + translation), extracts features from both, and
measures:

- keypoint repeatability: fraction of warped-volume keypoints whose
  mapped location + scale has a counterpart in the original;
- match recall: fraction of ground-truth correspondence pairs recovered
  as Hough inliers by match_keys;
- transform error of the recovered registration vs the known warp.

Usage: python scripts/recall_harness.py [--dims 96] [--angle 10]
       [--scale 1.1] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SIFT3D_FORCE_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")


def make_volume(dims, seed=11):
    rng = np.random.default_rng(seed)
    z, y, x = np.mgrid[0:dims, 0:dims, 0:dims].astype(np.float32)
    vol = np.zeros((dims, dims, dims), np.float32)
    c = dims / 2
    r2 = ((z - c) ** 2 + (y - c) ** 2 + (x - c) ** 2) / (0.48 * dims) ** 2
    vol += 250.0 * np.exp(-1.5 * r2)
    for _ in range(max(10, dims // 3)):
        bc = rng.uniform(0.25, 0.75, 3) * dims
        s = rng.uniform(2.4, 6.0) * max(1.0, dims / 96.0)
        a = rng.uniform(-180, 260)
        m2 = (z - bc[0]) ** 2 + (y - bc[1]) ** 2 + (x - bc[2]) ** 2
        vol += a * np.exp(-m2 / (2 * s * s))
    return vol


def warp_volume(vol, rot, scale, trans):
    """V2(p) = V1(T(p)) with T(p) = scale * R @ (p - c) + c + trans, in the
    reference's 0.5-voxel-center coordinate convention."""
    import jax.numpy as jnp

    from sift3d.kernels.resample import trilinear_sample

    zd, yd, xd = vol.shape
    c = np.array([xd, yd, zd], np.float64) / 2.0
    z, y, x = np.mgrid[0:zd, 0:yd, 0:xd].astype(np.float64)
    pts = np.stack([x + 0.5, y + 0.5, z + 0.5], axis=-1) - c
    src = (scale * pts @ rot.T) + c + trans
    out = trilinear_sample(
        jnp.asarray(vol), jnp.asarray(src[..., 0], jnp.float32),
        jnp.asarray(src[..., 1], jnp.float32), jnp.asarray(src[..., 2], jnp.float32),
    )
    return np.asarray(out, np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, default=96)
    ap.add_argument("--angle", type=float, default=10.0)
    ap.add_argument("--scale", type=float, default=1.1)
    ap.add_argument("--trans", type=float, default=3.0)
    ap.add_argument(
        "--reference", action="store_true",
        help="also run the reference binary on the same pair and score it",
    )
    args = ap.parse_args()

    from sift3d.core.config import DEFAULT_CONFIG
    from sift3d.match.pairwise import match_keys
    from sift3d.pipeline.extract import extract_features_many
    from sift3d.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    th = np.deg2rad(args.angle)
    rot = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float64
    )
    scale = args.scale
    trans = np.array([args.trans, -args.trans / 2, args.trans / 3])

    v1 = make_volume(args.dims)
    v2 = warp_volume(v1, rot, scale, trans)
    f1, f2 = extract_features_many([v1, v2], DEFAULT_CONFIG)
    f1 = f1.apply_eig_threshold(140.0).remove_non_reoriented()
    f2 = f2.apply_eig_threshold(140.0).remove_non_reoriented()
    print(f"features: v1={len(f1)} v2={len(f2)}")

    if args.reference:
        import shutil
        import stat
        import subprocess
        import tempfile

        from sift3d.io import keyfile, nifti

        tmp = tempfile.mkdtemp(prefix="sift3d_recall_")
        ref_bin = os.path.join(tmp, "featExtract")
        shutil.copy(
            "/root/reference/3dsift_cleanup-softVote_App_Weight_SoftMax/bin/Linux/featExtract",
            ref_bin,
        )
        os.chmod(ref_bin, os.stat(ref_bin).st_mode | stat.S_IXUSR)
        rf = []
        for i, v in enumerate((v1, v2)):
            vp = os.path.join(tmp, f"v{i}.nii")
            nifti.write(vp, v)
            kp = os.path.join(tmp, f"v{i}.key")
            subprocess.run([ref_bin, vp, kp], check=True, capture_output=True, timeout=1800)
            feats, _ = keyfile.read_text(kp)
            rf.append(feats.remove_non_reoriented())
        print(f"reference features: v1={len(rf[0])} v2={len(rf[1])}")
        f1, f2 = rf  # score the reference's own output below
        shutil.rmtree(tmp, ignore_errors=True)

    # feature in V2 at p2 corresponds to V1 at T(p2)
    zd, yd, xd = v1.shape
    c = np.array([xd, yd, zd], np.float64) / 2.0
    mapped = scale * (f2.xyz - c) @ rot.T + c + trans  # V2 -> V1 coords
    mapped_scale = f2.scale * scale

    d = np.linalg.norm(mapped[:, None, :] - f1.xyz[None, :, :], axis=-1)
    sr = mapped_scale[:, None] / f1.scale[None, :]
    true_pair = (d < 2.0) & (sr < 2 ** (1 / 3)) & (sr > 2 ** (-1 / 3))
    has_truth = true_pair.any(axis=1)
    repeatability = float(has_truth.mean())
    print(f"keypoint repeatability under warp: {repeatability:.3f}")

    res = match_keys(f1, f2, DEFAULT_CONFIG)
    inl = res.inlier
    m2 = res.model_idx[inl]  # indices into f2
    m1 = res.input_idx[inl]  # indices into f1
    correct = true_pair[m2, m1]
    precision = float(correct.mean()) if len(m2) else 0.0
    # recall over f2 features that have a ground-truth counterpart
    matched_true = np.zeros(len(f2), bool)
    matched_true[m2[correct]] = True
    recall = float(matched_true[has_truth].mean()) if has_truth.any() else 0.0
    print(f"inliers: {inl.sum()} / {len(res.model_idx)} matches")
    print(f"match precision (inliers that are true pairs): {precision:.3f}")
    print(f"match recall (true-pair features recovered):  {recall:.3f}")

    err_s = abs(res.transform.scale - scale) / scale
    err_r = np.abs(res.transform.rot - rot).max()
    print(f"recovered transform: scale err {err_s:.4f}, rot err {err_r:.4f}, "
          f"trans {np.round(res.transform.trans, 2)} (true offset incl. center term)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
