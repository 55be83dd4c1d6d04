"""Root-cause probe for TPU-vs-CPU extrema divergence (-2+ and -w chains).

PARITY_r03's residual divergence concentrated at -2+ cells: the TPU path
emitted up to 33% more features there (64^3 seed-3: 36 vs 27 unoriented),
always MORE and always at -2+ (VERDICT r3 #4) — root-caused by this probe
to bf16x3 blur false extrema and fixed (HIGHEST blur on -2+). Round 5
generalizes it to the residual -w cells (anisotropic-voxel trilinear
resample -> blur; PARITY_r04 64^3/96^3 seed-3, VERDICT r4 #2) via
--chain world. The probe pins down which op's rounding flips the
divergent extrema candidates:

  1. the same pyramid is computed by four chains —
     cpu-f32 (matches the reference binary exactly: 9/9 EXACT -2+
     control, both residual -w cells EXACT on CPU),
     tpu-high (production: blur matmuls at bf16x3),
     tpu-highest (SIFT3D_BLUR_MATMUL_PRECISION=highest: f32 MXU passes),
     f64 (numpy replication of double_size / isotropic resample + banded
     blurs + DoG + 80-neighbor stencil, SAME f32 tap values and f32
     interpolation weights, f64 accumulation) —
     each dumping every octave's extrema-candidate set;
  2. the driver diffs the sets and scores every disputed candidate
     against the f64 ground truth: is it a true extremum in f64, and
     what is its f64 margin (center minus the closest of its 80
     neighbors)?

Interpretation guide: if tpu-surplus candidates are true f64 extrema,
the TPU chain is the MORE accurate one and the 'surplus' is the CPU
chain losing borderline extrema; if they are not, the bf16x3 blur is
flipping ties and tpu-highest should remove them. Margins ~0 either way
mean borderline ties — backend float divergence, as the CPU control
already suggested, but now attributed per-op.

Usage:
  python scripts/doubled_surplus_probe.py --driver [--dims 64 --seed 3]
      [--chain doubled|world] [--voxel 1,1,1.5]
  (single-chain mode, used by the driver itself:
   python scripts/doubled_surplus_probe.py --mode f64 --out x.npz)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_volume(dims, seed):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from parity_vs_reference import synthetic_volume as sv

    return sv(dims, seed=seed)


# ---------------------------------------------------------------------------
# f64 numpy replication (ground truth)
# ---------------------------------------------------------------------------


def _banded64(dim, sigma, min_value):
    """f64 banded blur matrix built from the SAME f32 tap values the jax
    chains use (gauss.gaussian_kernel_1d), so the only difference vs the
    production chains is accumulation precision, not filter content."""
    from sift3d.kernels.gauss import gaussian_kernel_1d

    taps = gaussian_kernel_1d(sigma, min_value).astype(np.float64)
    r = len(taps) // 2
    b = np.zeros((dim, dim), np.float64)
    for o in range(dim):
        lo, hi = max(0, o - r), min(dim, o + r + 1)
        b[lo:hi, o] = taps[lo - o + r : hi - o + r]
    return b


def blur3d64(vol, sigma, min_value=0.01):
    if sigma <= 0:
        return vol
    out = np.einsum("zyx,xw->zyw", vol, _banded64(vol.shape[2], sigma, min_value))
    out = np.einsum("zyx,yw->zwx", out, _banded64(vol.shape[1], sigma, min_value))
    out = np.einsum("zyx,zw->wyx", out, _banded64(vol.shape[0], sigma, min_value))
    return out


def double_size64(vol):
    out = vol.astype(np.float64)
    for axis in range(3):
        a = np.moveaxis(out, axis, 0)
        nxt = np.concatenate([a[1:], a[-1:]], axis=0)
        stacked = np.stack([a, 0.5 * (a + nxt)], axis=1)
        out = np.moveaxis(stacked.reshape((2 * a.shape[0],) + a.shape[1:]), 0, axis)
    return out


def resample64(vol, voxel):
    """f64 isotropic resample with the SAME f32 interpolation weights the
    jax chains compute (resample.isotropic_resample: coords built in f32,
    0.5-center convention of _fioDetermineInterpCoord) — so the only
    difference vs the f32 chains is blend accumulation precision."""
    dx, dy, dz = [float(v) for v in voxel]
    dmin = min(dx, dy, dz)
    zd, yd, xd = vol.shape
    oz, oy, ox = int(zd * dz / dmin), int(yd * dy / dmin), int(xd * dx / dmin)

    def coords(o, f, dim):
        c = np.arange(o, dtype=np.float32) * np.float32(f) + np.float32(0.5)
        ch = c - np.float32(0.5)
        i = np.clip(np.floor(ch).astype(np.int64), 0, dim - 2)
        w = np.float32(1.0) - (ch - i.astype(np.float32))
        w = np.where(c < np.float32(0.5), np.float32(1.0), w)
        w = np.where(c >= np.float32(dim) - np.float32(0.5), np.float32(0.0), w)
        return i, w.astype(np.float64)

    iz, wz = coords(oz, dmin / dz, zd)
    iy, wy = coords(oy, dmin / dy, yd)
    ix, wx = coords(ox, dmin / dx, xd)
    v = vol.astype(np.float64)

    def g(dzo, dyo, dxo):
        return v[np.ix_(iz + dzo, iy + dyo, ix + dxo)]

    wxb = wx[None, None, :]
    n00 = wxb * g(0, 0, 0) + (1.0 - wxb) * g(0, 0, 1)
    n10 = wxb * g(0, 1, 0) + (1.0 - wxb) * g(0, 1, 1)
    n01 = wxb * g(1, 0, 0) + (1.0 - wxb) * g(1, 0, 1)
    n11 = wxb * g(1, 1, 0) + (1.0 - wxb) * g(1, 1, 1)
    wyb = wy[None, :, None]
    nn0 = wyb * n00 + (1.0 - wyb) * n10
    nn1 = wyb * n01 + (1.0 - wyb) * n11
    return wz[:, None, None] * nn0 + (1.0 - wz[:, None, None]) * nn1


def subsample64(vol):
    z2, y2, x2 = (d // 2 for d in vol.shape)
    v = vol[: 2 * z2, : 2 * y2, : 2 * x2].reshape(z2, 2, y2, 2, x2, 2)
    return v.mean(axis=(1, 3, 5))


def extrema_margins64(dogs):
    """[5, Z, Y, X] f64 DoGs -> (mask [3, ...] int8, margin [3, ...] f32).

    margin > 0 iff strict 80-neighbor extremum; |margin| is the distance
    to the closest disqualifying neighbor (the tie-sensitivity measure).
    """
    nl, zd, yd, xd = dogs.shape
    mask = np.zeros((3, zd, yd, xd), np.int8)
    margin = np.full((3, zd, yd, xd), -np.inf, np.float32)
    sl = slice(1, -1)
    for c in (1, 2, 3):
        center = dogs[c, sl, sl, sl]
        nmax = np.full_like(center, -np.inf)
        nmin = np.full_like(center, np.inf)
        for dl in (-1, 0, 1):
            for dz in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        if dl == 0 and dz == 0 and dy == 0 and dx == 0:
                            continue
                        nb = dogs[
                            c + dl,
                            1 + dz : zd - 1 + dz,
                            1 + dy : yd - 1 + dy,
                            1 + dx : xd - 1 + dx,
                        ]
                        np.maximum(nmax, nb, out=nmax)
                        np.minimum(nmin, nb, out=nmin)
        m = np.maximum(center - nmax, nmin - center)  # >0 iff strict extremum
        mask[c - 1, sl, sl, sl] = np.where(
            center > nmax, 1, np.where(center < nmin, -1, 0)
        ).astype(np.int8)
        margin[c - 1, sl, sl, sl] = m.astype(np.float32)
    return mask, margin


def run_f64(vol, cfg, initial_scale, out_path, chain="doubled", voxel=None):
    import math

    sigma_init = cfg.sigma_init / initial_scale
    src = double_size64(vol) if chain == "doubled" else resample64(vol, voxel)
    base = blur3d64(
        src,
        math.sqrt(max(cfg.sigma_base**2 - sigma_init**2, 0.0)),
        cfg.blur_precision,
    )
    inc = cfg.incremental_sigmas()
    payload = {}
    octave = 0
    while all(d > 2 for d in base.shape):
        levels = [base]
        for j in range(1, cfg.blurs_total):
            levels.append(blur3d64(levels[-1], inc[j - 1], cfg.blur_precision))
        dogs = np.stack([levels[j] - levels[j + 1] for j in range(5)])
        mask, margin = extrema_margins64(dogs)
        payload[f"mask_o{octave}"] = mask
        payload[f"margin_o{octave}"] = margin
        base = subsample64(levels[cfg.blurs_per_octave])
        octave += 1
    payload["n_oct"] = np.asarray(octave)
    np.savez_compressed(out_path, **payload)


# ---------------------------------------------------------------------------
# jax chain (runs on whatever backend the env provides)
# ---------------------------------------------------------------------------


def run_jax(vol, cfg, initial_scale, out_path, chain="doubled", voxel=None):
    import jax
    import jax.numpy as jnp

    from sift3d.kernels.resample import double_size, isotropic_resample
    from sift3d.pipeline import pyramid

    if chain == "doubled":
        src = double_size(jnp.asarray(vol))
    else:
        src, _ = isotropic_resample(jnp.asarray(vol), voxel)
    base = pyramid.initial_blur_core(src, cfg, initial_scale)
    payload = {}
    octave = 0
    while all(d > 2 for d in base.shape):
        gstack, dogs, mask, base = pyramid.octave_core(base, cfg)
        payload[f"mask_o{octave}"] = np.asarray(mask)
        octave += 1
    payload["n_oct"] = np.asarray(octave)
    payload["backend"] = np.asarray(jax.default_backend())
    np.savez_compressed(out_path, **payload)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def _coords(mask):
    l, z, y, x = np.nonzero(mask)
    return set(zip(l.tolist(), z.tolist(), y.tolist(), x.tolist()))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, default=64)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--chain", choices=["doubled", "world"], default="doubled",
                    help="doubled = the -2+ path; world = the -w path "
                         "(anisotropic trilinear resample, featExtract.cpp:118-204)")
    ap.add_argument("--voxel", default="1,1,1.5",
                    help="world-chain voxel size (x,y,z) — the parity "
                         "sweep's -w cells use 1,1,1.5")
    ap.add_argument("--mode", choices=["jax", "f64"], default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--driver", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    if args.json is None:
        args.json = ("doubled_surplus_probe.json" if args.chain == "doubled"
                     else "world_surplus_probe.json")

    from sift3d.core.config import DEFAULT_CONFIG

    cfg = DEFAULT_CONFIG
    vol = synthetic_volume(args.dims, args.seed)
    voxel = tuple(float(v) for v in args.voxel.split(","))
    # -2+ runs the half-scale initial blur (featExtract.cpp:368-379);
    # -w keeps scale 1.0 — the resample changes the grid, not the scale
    initial_scale = 0.5 if args.chain == "doubled" else 1.0

    if args.mode == "f64":
        run_f64(vol.astype(np.float64), cfg, initial_scale, args.out,
                args.chain, voxel)
        return 0
    if args.mode == "jax":
        run_jax(vol, cfg, initial_scale, args.out, args.chain, voxel)
        return 0
    assert args.driver, "pass --driver or --mode"

    import tempfile

    tmp = tempfile.mkdtemp(prefix="sift3d_probe_")
    me = os.path.abspath(__file__)
    chains = {}
    runs = [
        ("cpu_f32", {}, "jax"),
        ("tpu_high", {}, "jax"),
        ("tpu_highest", {"SIFT3D_BLUR_MATMUL_PRECISION": "highest"}, "jax"),
        ("f64", {}, "f64"),
    ]
    for name, env_extra, mode in runs:
        out = os.path.join(tmp, f"{name}.npz")
        env = dict(os.environ, **env_extra)
        child_argv = [me, "--mode", mode, "--out", out,
                      "--dims", str(args.dims), "--seed", str(args.seed),
                      "--chain", args.chain, "--voxel", args.voxel]
        cmd = [sys.executable] + child_argv
        if name == "cpu_f32":
            # force the CPU platform inside the child BEFORE any jax API
            # call (env JAX_PLATFORMS is snapshotted at interpreter start
            # by this container's sitecustomize, so only jax.config works)
            cmd = [sys.executable, "-c",
                   "import jax; jax.config.update('jax_platforms','cpu');"
                   "import runpy, sys; sys.argv=%r; runpy.run_path(%r, run_name='__main__')"
                   % (child_argv, me)]
        print(f"running chain {name} ...", flush=True)
        r = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=3600)
        if r.returncode != 0:
            print(r.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(f"chain {name} failed")
        chains[name] = np.load(out, allow_pickle=False)
        # the chain labels are claims about the platform: fail loudly if a
        # 'tpu_*' chain silently ran on CPU (e.g. this host has no TPU) —
        # otherwise the probe compares CPU-vs-CPU under TPU labels (ADVICE r4)
        if "backend" in chains[name]:
            backend = str(chains[name]["backend"])
            if name.startswith("cpu") and backend != "cpu":
                raise RuntimeError(f"chain {name} ran on backend {backend!r}, expected cpu")
            if name.startswith("tpu") and backend == "cpu":
                raise RuntimeError(
                    f"chain {name} ran on backend 'cpu' — no TPU visible; "
                    "the probe's TPU labels would be lies. Run where the TPU "
                    "backend registers."
                )

    f64d = chains["f64"]
    n_oct = int(f64d["n_oct"])
    report = {"dims": args.dims, "seed": args.seed, "chain": args.chain,
              "voxel": list(voxel) if args.chain == "world" else None,
              "octaves": {}}
    for o in range(n_oct):
        sets = {}
        for name in ("cpu_f32", "tpu_high", "tpu_highest", "f64"):
            key = f"mask_o{o}"
            sets[name] = _coords(chains[name][key]) if key in chains[name] else set()
        margin = f64d[f"margin_o{o}"]

        def probe(diff):
            rows = []
            for (l, z, y, x) in sorted(diff):
                rows.append(
                    {
                        "lvl": l, "z": z, "y": y, "x": x,
                        "f64_margin": float(margin[l, z, y, x]),
                        "f64_extremum": bool((l, z, y, x) in sets["f64"]),
                        "in_tpu_highest": bool((l, z, y, x) in sets["tpu_highest"]),
                    }
                )
            return rows

        rep = {
            "counts": {k: len(v) for k, v in sets.items()},
            "tpu_minus_cpu": probe(sets["tpu_high"] - sets["cpu_f32"]),
            "cpu_minus_tpu": probe(sets["cpu_f32"] - sets["tpu_high"]),
        }
        report["octaves"][f"o{o}"] = rep
        print(f"octave {o}: counts {rep['counts']}; "
              f"tpu-only {len(rep['tpu_minus_cpu'])}, cpu-only {len(rep['cpu_minus_tpu'])}")

    # summary verdicts — both directions (the -2+ cells diverged as TPU
    # surplus; the -w cells show BOTH surplus and deficit, PARITY_r04)
    summary = {}
    tpu_only = [r for o in report["octaves"].values() for r in o["tpu_minus_cpu"]]
    if tpu_only:
        margins = [abs(r["f64_margin"]) for r in tpu_only]
        summary.update({
            "tpu_surplus_candidates": len(tpu_only),
            "surplus_fraction_true_in_f64": round(
                float(np.mean([r["f64_extremum"] for r in tpu_only])), 3),
            "surplus_abs_f64_margin_median": float(np.median(margins)),
            "surplus_abs_f64_margin_max": float(np.max(margins)),
            "surplus_fraction_removed_by_highest_blur": round(
                float(np.mean([not r["in_tpu_highest"] for r in tpu_only])), 3),
        })
    cpu_only = [r for o in report["octaves"].values() for r in o["cpu_minus_tpu"]]
    if cpu_only:
        margins = [abs(r["f64_margin"]) for r in cpu_only]
        summary.update({
            "tpu_deficit_candidates": len(cpu_only),
            "deficit_fraction_true_in_f64": round(
                float(np.mean([r["f64_extremum"] for r in cpu_only])), 3),
            "deficit_abs_f64_margin_median": float(np.median(margins)),
            "deficit_abs_f64_margin_max": float(np.max(margins)),
            "deficit_fraction_restored_by_highest_blur": round(
                float(np.mean([r["in_tpu_highest"] for r in cpu_only])), 3),
        })
    if summary:
        report["summary"] = summary
        print("summary:", json.dumps(summary, indent=1))
    with open(args.json, "wt") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
