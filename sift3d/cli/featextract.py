"""featextract — flag-compatible CLI for volumetric feature extraction.

Usage (mirrors featExtract/featExtract.cpp:222-236 plus the README's
descriptor flags that the reference snapshot parses but never wires up,
SURVEY.md section 2.3 quirk 1 — here they work):

    python -m sift3d.cli.featextract [options] <input image> <output features>

      <input image>:  nifti (.nii, .nii.gz, .hdr)
      <output features>: .key text file
      -w   : world coordinates (qto_xyz; -ws uses sto_xyz), implies
             isotropic resampling
      -2+  : double input image size       -2- : halve input image size
      -b   : BRIEF descriptor   -br : RRIEF   -bn : NRRIEF
      -d<N>: accepted for compatibility (device selection is implicit on TPU)
      --spatial[=N] : Z-shard the whole pipeline over N devices (default
             all) for volumes larger than one chip's memory
      --spatial-octaves=K : shard the first K octaves (default: octaves
             whose working set exceeds one chip); implies --spatial
      --time : print per-stage timing summary
"""

from __future__ import annotations

import sys

import numpy as np

import jax.numpy as jnp

from sift3d.core.config import DEFAULT_CONFIG
from sift3d.io import keyfile, nifti
from sift3d.kernels.resample import double_size, isotropic_resample, subsample_2x
from sift3d.pipeline.extract import extract_features
from sift3d.utils.timing import StageTimer


def print_options():
    print(__doc__)


def main(argv=None) -> int:
    from sift3d.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 2:
        print_options()
        return -1

    double_image = 0
    world_coords = 0
    isotropic = False
    descriptor = "goh"
    show_time = False
    debug_pgm = False
    spatial_devices = None  # None = off; 0 = all devices; N = first N
    spatial_octaves = None  # None = auto (by octave working-set size)
    i = 0
    while i < len(argv) and argv[i].startswith("-"):
        a = argv[i]
        if a.startswith("-2"):
            double_image = -1 if a[2:3] == "-" else 1
        elif a.startswith("-d"):
            pass  # device selection is implicit (jax.devices())
        elif a in ("-w", "-W"):
            world_coords, isotropic = 1, True
        elif a in ("-ws", "-WS", "-wS", "-Ws"):
            world_coords, isotropic = 2, True
        elif a == "-b":
            descriptor = "brief"
        elif a == "-br":
            descriptor = "rrief"
        elif a == "-bn":
            descriptor = "nrrief"
        elif a == "--time":
            show_time = True
        elif a == "--debug-pgm":
            debug_pgm = True
        elif a.startswith("--spatial"):
            # Z-shard the volume over N devices (all by default) and run
            # the whole pipeline sharded — for volumes larger than one
            # chip's memory (sift3d.dist.spatial; the reference caps at
            # single-GPU memory, MultiScale.cpp:271-282)
            if a.startswith("--spatial-octaves"):
                spatial_octaves = int(a.split("=", 1)[1])
                if spatial_devices is None:
                    spatial_devices = 0
            else:
                spatial_devices = int(a.split("=", 1)[1]) if "=" in a else 0
        else:
            print(f"Error: unknown command line argument: {a}")
            print_options()
            return -1
        i += 1
    if len(argv) - i < 2:
        print_options()
        return -1
    in_path, out_path = argv[i], argv[i + 1]

    print(f"Extracting features: {in_path}")
    try:
        vol = nifti.read_volume(in_path)
    except (OSError, ValueError) as e:
        print(f"Error: could not read input file: {in_path} ({e})")
        return -1
    data = jnp.asarray(vol.data)
    dx, dy, dz = vol.voxel_size
    world = vol.world_matrix(use_sform=(world_coords == 2)).copy()

    resampled = False
    if isotropic and (dx != dy or dy != dz or dx != dz):
        data, dmin = isotropic_resample(data, vol.voxel_size)
        # rescale the direction cosines per column (featExtract.cpp:162-176)
        factors = np.array([dmin / dx, dmin / dy, dmin / dz])
        world[:3, :3] = world[:3, :3] * factors[None, :]
        dx = dy = dz = dmin
        resampled = True

    import dataclasses

    cfg = DEFAULT_CONFIG
    initial_scale = 1.0
    if resampled:
        # -w resampled chains REQUIRE HIGHEST blur (f64-probe-attributed
        # bf16x3 tie-flips, world_surplus_probe_{64,96}.json). HIGHEST
        # is the module default since round 5; this explicit pin keeps
        # the guarantee even if the env default is lowered for speed
        # experiments.
        cfg = dataclasses.replace(cfg, blur_matmul_precision="highest")
    if double_image == 1:
        # -2+ doubled chains REQUIRE HIGHEST blur (round-4 f64 probe:
        # every TPU-surplus candidate was a bf16x3 false positive).
        # Explicit pin for the same reason as -w above.
        cfg = dataclasses.replace(cfg, blur_matmul_precision="highest")
        data = double_size(data)
        initial_scale = 0.5
    elif double_image == -1:
        data = subsample_2x(data)

    if data.shape[0] <= 1:
        print(f"Could not read volume: {in_path}")
        return -1
    print(f"Input image: i={data.shape[2]} j={data.shape[1]} k={data.shape[0]}")

    if debug_pgm:
        # mid-stack XY slice dump, the reference's eyeball check
        # (MultiScale.cpp:305-313 'image.pgm'), plus per-octave G1 blur
        # slices as image_o{N}.pgm (MultiScale.cpp:374-384 — the
        # reference overwrites the same file; we keep every octave)
        from sift3d.utils.pgm import write_pyramid_slices, write_volume_slice

        write_volume_slice("image.pgm", np.asarray(data))
        write_pyramid_slices(data, cfg, initial_scale)

    timer = StageTimer(enabled=True)
    if spatial_devices is not None:
        import jax

        from sift3d.dist.mesh import make_mesh
        from sift3d.dist.spatial import extract_features_spatial

        n_dev = len(jax.devices())
        n = n_dev if spatial_devices == 0 else min(spatial_devices, n_dev)
        mesh = make_mesh(batch=1, space=n, devices=jax.devices()[:n])
        feats = extract_features_spatial(
            np.asarray(data), mesh, cfg,
            initial_image_scale=initial_scale, descriptor=descriptor,
            sharded_octaves=spatial_octaves,
        )
    else:
        feats = extract_features(
            data, cfg, initial_image_scale=initial_scale,
            descriptor=descriptor, timer=timer,
        )

    # size factor for -2 options (featExtract.cpp:422-427, 502-505)
    size_factor = 1.0
    if double_image == 1:
        size_factor = 0.5
    elif double_image == -1:
        size_factor = 2.0
    feats.xyz *= size_factor
    feats.scale *= size_factor

    if world_coords:
        # convert coordinates, scale and orientation to world space
        # (featExtract.cpp:507-538)
        feats = feats.similarity_transform(world)

    comments = [
        "Extraction Voxel Resolution (ijk) : %d %d %d" % (data.shape[2], data.shape[1], data.shape[0]),
        "Extraction Voxel Size (mm)  (ijk) : %f %f %f" % (dx, dy, dz),
    ]
    if world_coords:
        m = world
        space = "qto_xyz" if world_coords == 1 else "sto_xyz"
        comments.append(
            "Feature Coordinate Space: millimeters (%s) : %f %f %f %f %f %f %f %f %f %f %f %f 0.0 0.0 0.0 1.0"
            % (space, *m[0, :], *m[1, :], *m[2, :])
        )
    else:
        comments.append(
            "Feature Coordinate Space: voxels: 1.0 0.0 0.0 0.0 0.0 1.0 0.0 0.0 0.0 0.0 1.0 0.0 0.0 0.0 0.0 1.0"
        )

    n = keyfile.write_text(feats, out_path, eig_threshold=DEFAULT_CONFIG.eig_threshold, comments=comments)
    if show_time:
        print(timer.summary())
    print(f"\nFeatures: {n}")
    print("\nDone.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
