"""Parity harness: run the reference CPU featExtract binary (if executable)
and this framework on the same synthetic volume, then compare keypoints.

Usage:
    python scripts/parity_vs_reference.py [--dims 64] [--ref <binary>]

Metrics (SURVEY.md section 6 / BASELINE.md targets):
  - keypoint count ratio (ours / reference)
  - keypoint repeatability: fraction of reference unoriented keypoints with
    one of ours within tol voxels and scale ratio < 2^(1/3)
  - reverse repeatability (ours covered by reference)
  - descriptor agreement on matched pairs (mean L2 of rank vectors)
"""

from __future__ import annotations

import argparse
import os
import shutil
import stat
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SIFT3D_FORCE_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

REF_BIN_SRC = (
    "/root/reference/3dsift_cleanup-softVote_App_Weight_SoftMax/bin/Linux/featExtract"
)


def synthetic_volume(dims=64, seed=3):
    """dims: int (cube) or (z, y, x) triple — the full-bench-size parity
    cells (VERDICT r3 #2) run the exact 182x218x182 MNI T1 grid and a
    non-pow-2 ~250^3 grid, matching what bench.py and the README measure."""
    if isinstance(dims, int):
        dims = (dims, dims, dims)
    dz, dy, dx = dims
    rng = np.random.default_rng(seed)
    z, y, x = np.mgrid[0:dz, 0:dy, 0:dx].astype(np.float32)
    vol = np.zeros(dims, np.float32)
    c = np.asarray(dims, np.float32) / 2
    r2 = (
        ((z - c[0]) / (0.45 * dz)) ** 2
        + ((y - c[1]) / (0.45 * dy)) ** 2
        + ((x - c[2]) / (0.45 * dx)) ** 2
    )
    vol += 300.0 * np.exp(-2.0 * r2)
    mean_dim = sum(dims) / 3.0
    for _ in range(max(6, int(mean_dim) // 4)):
        bc = rng.uniform(0.2, 0.8, 3) * np.asarray(dims)
        # blob size tracks volume size so halving (-2-) stays detectable
        s = rng.uniform(2.0, 5.0) * max(1.0, mean_dim / 64.0)
        a = rng.uniform(-150, 250)
        m2 = (z - bc[0]) ** 2 + (y - bc[1]) ** 2 + (x - bc[2]) ** 2
        vol += a * np.exp(-m2 / (2 * s * s))
    return vol.astype(np.float32)


def synthetic_blob_texture(dims=(182, 218, 182), seed=7, n_blobs=160):
    """bench.py's blob-texture generator (host-side numpy replica).

    The smoothed-noise generator above yields sparse cells (66-72
    features at full size); this one reproduces the benchmark's feature
    density (~1k-2k features at 182x218x182, bench.py:34-60) so parity
    is measured in the regime the bench and README actually claim —
    capacity paths, bucket overflow and compaction under load
    (VERDICT r4 #3). Same blob parameters as bench.synthetic_t1 (the
    separable outer-product evaluation differs only in f32 rounding;
    both sides read the identical NIfTI file, so parity is unaffected).
    """
    if isinstance(dims, int):
        dims = (dims, dims, dims)
    dz, dy, dx = dims
    rng = np.random.default_rng(seed)
    centers = (rng.uniform(0.2, 0.8, (n_blobs, 3)) * np.array(dims)).astype(np.float32)
    sigmas = rng.uniform(1.5, 6.0, n_blobs).astype(np.float32)
    amps = rng.uniform(-150, 250, n_blobs).astype(np.float32)

    z = np.arange(dz, dtype=np.float32)
    y = np.arange(dy, dtype=np.float32)
    x = np.arange(dx, dtype=np.float32)
    c = np.asarray(dims, np.float32) / 2
    r2 = (
        ((z[:, None, None] - c[0]) / (0.45 * dz)) ** 2
        + ((y[None, :, None] - c[1]) / (0.45 * dy)) ** 2
        + ((x[None, None, :] - c[2]) / (0.45 * dx)) ** 2
    )
    vol = 400.0 * np.exp(-2.0 * r2)
    inv2s2 = 1.0 / (2.0 * sigmas * sigmas)
    ez = amps[:, None] * np.exp(-((z[None, :] - centers[:, 0:1]) ** 2) * inv2s2[:, None])
    ey = np.exp(-((y[None, :] - centers[:, 1:2]) ** 2) * inv2s2[:, None])
    ex = np.exp(-((x[None, :] - centers[:, 2:3]) ** 2) * inv2s2[:, None])
    vol += np.einsum("nz,ny,nx->zyx", ez, ey, ex, optimize=True)
    return vol.astype(np.float32)


def parse_dims(s: str):
    """'64' -> 64; '182x218x182' -> (182, 218, 182) (z, y, x)."""
    if "x" in s:
        z, y, x = (int(v) for v in s.split("x"))
        return (z, y, x)
    return int(s)


def run_reference(ref_bin, vol_path, out_path, flags=()):
    r = subprocess.run(
        [ref_bin, *flags, vol_path, out_path], capture_output=True, text=True, timeout=1800
    )
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-2000:])
        raise RuntimeError(f"reference binary failed rc={r.returncode}")


def repeatability(a, b, tol=2.0, scale_ratio=2 ** (1.0 / 3.0)):
    """Fraction of features in `a` with a geometric match in `b`."""
    if len(a) == 0 or len(b) == 0:
        return 0.0, np.zeros(0, np.int64)
    d = np.linalg.norm(a.xyz[:, None, :] - b.xyz[None, :, :], axis=-1)
    sr = a.scale[:, None] / b.scale[None, :]
    ok = (d < tol) & (sr < scale_ratio) & (sr > 1.0 / scale_ratio)
    hit = ok.any(axis=1)
    nearest = np.where(hit, np.where(ok, d, np.inf).argmin(axis=1), -1)
    return float(hit.mean()), nearest


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=parse_dims, default=64,
                    help="cube edge (64) or ZxYxX triple (182x218x182)")
    ap.add_argument("--ref", default=None)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument(
        "--flags", default="", help="featExtract flags passed to BOTH sides (e.g. '-2-' or '-w')"
    )
    ap.add_argument(
        "--json", default=None, help="also write the parity metrics to this JSON file"
    )
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument(
        "--voxel", default="1,1,1",
        help="voxel size (x,y,z) written to the NIfTI header — pair an "
             "anisotropic size with -w to exercise the world-resample path "
             "(featExtract.cpp:118-204)",
    )
    ap.add_argument(
        "--generator", choices=["smooth", "blob"], default="smooth",
        help="smooth = sparse smoothed-blob fixture (60-150 feats); blob = "
             "the bench's dense blob texture (~1k-2k feats at full size)",
    )
    args = ap.parse_args()
    voxel = tuple(float(v) for v in args.voxel.split(","))

    tmp = tempfile.mkdtemp(prefix="sift3d_parity_")
    ref_bin = args.ref
    if ref_bin is None:
        ref_bin = os.path.join(tmp, "featExtract")
        shutil.copy(REF_BIN_SRC, ref_bin)
        os.chmod(ref_bin, os.stat(ref_bin).st_mode | stat.S_IXUSR)

    from sift3d.io import keyfile, nifti

    if args.generator == "blob":
        vol = synthetic_blob_texture(args.dims, seed=args.seed)
    else:
        vol = synthetic_volume(args.dims, seed=args.seed)
    vol_path = os.path.join(tmp, "vol.nii")
    nifti.write(vol_path, vol, voxel_size=voxel)

    flags = [f for f in args.flags.split() if f]
    ref_key = os.path.join(tmp, "ref.key")
    print(f"running reference binary on {args.dims}^3 volume {flags} ...")
    run_reference(ref_bin, vol_path, ref_key, flags)
    ref_feats, _ = keyfile.read_text(ref_key)

    print("running sift3d CLI ...")
    from sift3d.cli import featextract as fe_cli

    ours_key = os.path.join(tmp, "ours.key")
    rc = fe_cli.main([*flags, vol_path, ours_key])
    if rc != 0:
        raise RuntimeError(f"sift3d CLI failed rc={rc}")
    ours, _ = keyfile.read_text(ours_key)

    # compare unoriented keypoint geometry (one per detected extremum)
    ru = ref_feats.select(~ref_feats.is_reoriented)
    ou = ours.select(~ours.is_reoriented)
    print(f"reference: {len(ref_feats)} feats ({len(ru)} unoriented)")
    print(f"ours:      {len(ours)} feats ({len(ou)} unoriented)")
    fwd, nearest = repeatability(ru, ou)
    rev, _ = repeatability(ou, ru)
    print(f"repeatability ref->ours: {fwd:.3f}")
    print(f"repeatability ours->ref: {rev:.3f}")

    # reoriented-copy-count agreement per matched unoriented keypoint: the
    # reference emits <=30 reoriented copies per keypoint
    # (MultiScale.cpp:1821-1859); count agreement is the sensitive fidelity
    # metric for the orientation-histogram peak logic
    def copy_counts(full, unor, tol=0.75):
        rr = full.select(full.is_reoriented)
        if len(unor) == 0 or len(rr) == 0:
            return np.zeros(len(unor), np.int64)
        d = np.linalg.norm(unor.xyz[:, None, :] - rr.xyz[None, :, :], axis=-1)
        sr = unor.scale[:, None] / rr.scale[None, :]
        return ((d < tol) & (np.abs(np.log(sr)) < 1e-3)).sum(axis=1)

    copy_agree = copy_ref_mean = copy_our_mean = None
    m0 = nearest >= 0
    if m0.any():
        cr = copy_counts(ref_feats, ru)[m0]
        co = copy_counts(ours, ou)[nearest[m0]]
        copy_agree = float((cr == co).mean())
        copy_ref_mean, copy_our_mean = float(cr.mean()), float(co.mean())
        print(f"reoriented copies per matched keypoint: ref mean {cr.mean():.2f}, "
              f"ours mean {co.mean():.2f}, exact-agreement {copy_agree:.3f}")
        if (cr != co).any():
            for qi in np.nonzero(cr != co)[0][:12]:
                ui = np.nonzero(m0)[0][qi]
                print(f"  mismatch at ref kp {ui} xyz={ru.xyz[ui]} scale={ru.scale[ui]:.2f}: "
                      f"ref {cr[qi]} vs ours {co[qi]} copies")

    # descriptor agreement on matched unoriented pairs
    m = nearest >= 0
    desc_l2 = desc_l2_rand = None
    if m.any():
        dd = np.linalg.norm(ru.desc[m] - ou.desc[nearest[m]], axis=1)
        rand = np.linalg.norm(
            ru.desc[m] - ou.desc[np.random.default_rng(0).permutation(nearest[m])], axis=1
        )
        desc_l2, desc_l2_rand = float(dd.mean()), float(rand.mean())
        print(f"descriptor L2 matched pairs: mean {dd.mean():.1f} (random pairing {rand.mean():.1f})")
    if args.json:
        import json

        import jax

        with open(args.json, "wt") as f:
            json.dump(
                {
                    "dims": args.dims,
                    "flags": flags,
                    "seed": args.seed,
                    "voxel": list(voxel),
                    "generator": args.generator,
                    "backend": jax.default_backend(),
                    "ref_feats": len(ref_feats),
                    "our_feats": len(ours),
                    "ref_unoriented": len(ru),
                    "our_unoriented": len(ou),
                    "repeatability_ref_to_ours": round(fwd, 4),
                    "repeatability_ours_to_ref": round(rev, 4),
                    "feature_count_ratio": round(len(ours) / max(len(ref_feats), 1), 4),
                    "desc_l2_matched": desc_l2,
                    "desc_l2_random": desc_l2_rand,
                    "copy_count_agreement": copy_agree,
                    "copies_per_kp_ref": copy_ref_mean,
                    "copies_per_kp_ours": copy_our_mean,
                },
                f,
                indent=1,
            )
    if args.keep:
        print("artifacts in", tmp)
    else:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
