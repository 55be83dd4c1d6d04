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


def score_pair(f1, f2, vol_shape, rot, scale, trans, tag=""):
    """Repeatability / match precision / match recall of (f1 from V1, f2
    from V2) under the known warp. f1/f2 may come from DIFFERENT
    implementations — descriptors on both sides are rank vectors 0..63
    (NormalizeDataRankedPCs, MultiScale.cpp:207-233), so the ratio-test +
    Hough matcher (featMatchUtilities.cpp:1027-1260 semantics) scores
    mixed-source keys exactly as same-source ones."""
    from sift3d.core.config import DEFAULT_CONFIG
    from sift3d.match.pairwise import match_keys

    zd, yd, xd = vol_shape
    c = np.array([xd, yd, zd], np.float64) / 2.0
    mapped = scale * (f2.xyz - c) @ rot.T + c + trans  # V2 -> V1 coords
    mapped_scale = f2.scale * scale

    d = np.linalg.norm(mapped[:, None, :] - f1.xyz[None, :, :], axis=-1)
    sr = mapped_scale[:, None] / f1.scale[None, :]
    true_pair = (d < 2.0) & (sr < 2 ** (1 / 3)) & (sr > 2 ** (-1 / 3))
    has_truth = true_pair.any(axis=1)
    repeatability = float(has_truth.mean()) if len(f2) else 0.0

    res = match_keys(f1, f2, DEFAULT_CONFIG)
    inl = res.inlier
    m2 = res.model_idx[inl]  # indices into f2
    m1 = res.input_idx[inl]  # indices into f1
    correct = true_pair[m2, m1] if len(m2) else np.zeros(0, bool)
    precision = float(correct.mean()) if len(m2) else 0.0
    matched_true = np.zeros(len(f2), bool)
    matched_true[m2[correct]] = True
    recall = float(matched_true[has_truth].mean()) if has_truth.any() else 0.0

    err_s = abs(res.transform.scale - scale) / scale
    err_r = float(np.abs(res.transform.rot - rot).max())
    print(f"[{tag}] v1={len(f1)} v2={len(f2)} feats | repeat {repeatability:.3f} | "
          f"inliers {int(inl.sum())}/{len(res.model_idx)} | precision {precision:.3f} | "
          f"recall {recall:.3f} | scale_err {err_s:.4f} rot_err {err_r:.4f}")
    return {
        "n1": len(f1), "n2": len(f2),
        "repeatability": round(repeatability, 4),
        "inliers": int(inl.sum()), "matches": int(len(res.model_idx)),
        "precision": round(precision, 4), "recall": round(recall, 4),
        "scale_err": round(float(err_s), 5), "rot_err": round(err_r, 5),
    }


def extract_reference(vols, tmp):
    """Run the reference CPU binary on each volume; returns FeatureSets."""
    import shutil
    import stat
    import subprocess

    from sift3d.io import keyfile, nifti

    ref_bin = os.path.join(tmp, "featExtract")
    shutil.copy(
        "/root/reference/3dsift_cleanup-softVote_App_Weight_SoftMax/bin/Linux/featExtract",
        ref_bin,
    )
    os.chmod(ref_bin, os.stat(ref_bin).st_mode | stat.S_IXUSR)
    out = []
    for i, v in enumerate(vols):
        vp = os.path.join(tmp, f"v{i}.nii")
        nifti.write(vp, v)
        kp = os.path.join(tmp, f"v{i}.key")
        subprocess.run([ref_bin, vp, kp], check=True, capture_output=True, timeout=1800)
        feats, _ = keyfile.read_text(kp)
        out.append(feats.remove_non_reoriented())
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, default=96)
    ap.add_argument("--seed", type=int, default=11,
                    help="volume seed (the multi-seed sweep, VERDICT r3 #3)")
    ap.add_argument("--angle", type=float, default=10.0)
    ap.add_argument("--scale", type=float, default=1.1)
    ap.add_argument("--trans", type=float, default=3.0)
    ap.add_argument(
        "--reference", action="store_true",
        help="also run the reference binary: ref-vs-ref control + the two "
             "cross-implementation directions (BASELINE.md match-recall target)",
    )
    ap.add_argument("--json", default=None, help="write all scores to this JSON file")
    args = ap.parse_args()

    from sift3d.core.config import DEFAULT_CONFIG
    from sift3d.pipeline.extract import extract_features_many
    from sift3d.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    th = np.deg2rad(args.angle)
    rot = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float64
    )
    scale = args.scale
    trans = np.array([args.trans, -args.trans / 2, args.trans / 3])

    v1 = make_volume(args.dims, seed=args.seed)
    v2 = warp_volume(v1, rot, scale, trans)
    f1, f2 = extract_features_many([v1, v2], DEFAULT_CONFIG)
    f1 = f1.apply_eig_threshold(140.0).remove_non_reoriented()
    f2 = f2.apply_eig_threshold(140.0).remove_non_reoriented()

    results = {
        "dims": args.dims, "seed": args.seed, "angle_deg": args.angle,
        "scale": scale, "trans": list(trans),
        "ours_vs_ours": score_pair(f1, f2, v1.shape, rot, scale, trans, "ours-vs-ours"),
    }

    if args.reference:
        import shutil
        import tempfile

        tmp = tempfile.mkdtemp(prefix="sift3d_recall_")
        try:
            r1, r2 = extract_reference([v1, v2], tmp)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        # control: the reference matched against itself on the same pair
        results["ref_vs_ref"] = score_pair(r1, r2, v1.shape, rot, scale, trans, "ref-vs-ref")
        # cross-implementation: OUR keys matched against the REFERENCE's
        # (both directions) — the honest BASELINE.md:29 evaluation
        results["ref1_vs_ours2"] = score_pair(r1, f2, v1.shape, rot, scale, trans, "ref(v1)-vs-ours(v2)")
        results["ours1_vs_ref2"] = score_pair(f1, r2, v1.shape, rot, scale, trans, "ours(v1)-vs-ref(v2)")

    if args.json:
        import json

        with open(args.json, "wt") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
