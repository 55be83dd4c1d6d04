"""featmatch — flag-compatible CLI for group feature matching.

Usage (mirrors featMatchMultiple/featMatchMultiple.cpp:398-486):

    python -m sift3d.cli.featmatch [options] <keys1> <keys2> ...

      -o <file> : report file name (default report.txt)
      -s <N>    : peak/valley handling: 0 peaks only, 1 valleys only,
                  2 split peak+valley reruns, 4 both (default)
      -r / -r-  : use only reoriented features (default) / only unoriented
      -n <N>    : nearest neighbors for group voting (default 5)
      -f <file> : read key-file list from a text file
      -g <W>    : geometry weight for group voting: augment descriptors
                  with W * xyz / scale (default -1 = off)
      --all-to-all : run the soft-vote group matcher (matchAllToAll)
                     in addition to pairwise registration
      --shard-match : shard the group-vote kNN over all devices (mesh
                      analogue of the OpenMP chunks, featMatchMultiple.cpp:108)

Outputs (same files as the reference): _command.txt, _names.txt,
feature_count.txt, per-pair .matches.img1/img2.txt + .trans.txt +
.trans-inverse.txt + .update.key, report.txt; with --all-to-all also
matching_votes.txt / vote_count.txt.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from sift3d.core.config import DEFAULT_CONFIG
from sift3d.io import keyfile
from sift3d.match import groupvote
from sift3d.match.pairwise import match_keys
from sift3d.utils.textfile import read_lines


def match_all_to_one(names, feature_sets, out_report="report.txt", cfg=DEFAULT_CONFIG, refine=False):
    """Pairwise registration of every image to image 0
    (featMatchMultiple.cpp:147-395).

    Every pair shares image 0 as the database, so the squared-distance
    matrices of all query sets compute as ONE stacked host BLAS matmul
    (the exact sequential-shuffle ratio test needs full rows, not top-k;
    see sift3d.match.pairwise)."""
    from sift3d.match.pairwise import dist_sqr_matrix

    f1 = feature_sets[0]
    dist_split = {}
    rest = [i for i in range(1, len(feature_sets)) if len(feature_sets[i])]
    if len(f1) >= 2 and rest:
        all_q = np.concatenate([feature_sets[i].desc for i in rest])
        dists = dist_sqr_matrix(all_q, f1.desc)
        off = 0
        for i in rest:
            n = len(feature_sets[i])
            dist_split[i] = dists[off : off + n]
            off += n
    for i in range(1, len(feature_sets)):
        f2 = feature_sets[i]
        res = match_keys(f1, f2, cfg, refine=refine, dists=dist_split.get(i))
        ts = res.transform

        matches = [
            (int(res.input_idx[m]), int(res.model_idx[m]))
            for m in range(len(res.model_idx))
            if res.inlier[m]
        ]
        name = names[i]
        with open(f"{name}.matches.info.txt", "wt") as f:
            # per inlier match: info flags of both features
            # (featMatchMultiple.cpp:301-302, 319)
            for i1, i2 in matches:
                f.write(f"{int(f1.info[i1])}\t{int(f2.info[i2])}\n")
        with open(f"{name}.matches.img1.txt", "wt") as f:
            f.write(f"# Img1: {names[0]}\n# Img2: {name}\n# Matches: {len(matches)}\n")
            f.write("# Format: Img1 x1 y1 z1 s1 MatchIndexImg2 DistSqr\n")
            for m, (i1, i2) in enumerate(matches):
                o = f1.ori[i1]
                f.write(
                    "%s\t%f\t%f\t%f\t%f\timg2_match%4.4d_feat%6.6d\t%f\t%f\t%f\t%f\t%f\t%f\t%f\t%f\t%f\t%f\n"
                    % (names[0], *f1.xyz[i1], f1.scale[i1], m, i2, 0.0, *o.reshape(9))
                )
        with open(f"{name}.matches.img2.txt", "wt") as f:
            f.write(f"# Img1: {names[0]}\n# Img2: {name}\n# Matches: {len(matches)}\n")
            f.write("# Format: Img2 x2 y2 z2 s2 MatchIndexImg1 DistSqr\n")
            for m, (i1, i2) in enumerate(matches):
                o = f2.ori[i2]
                f.write(
                    "%s\t%f\t%f\t%f\t%f\timg2_match%4.4d_feat%6.6d\t%f\t%f\t%f\t%f\t%f\t%f\t%f\t%f\t%f\t%f\n"
                    % (name, *f2.xyz[i2], f2.scale[i2], m, i1, 0.0, *o.reshape(9))
                )
        ts.write_matrix(f"{name}.trans.txt")
        ts.inverse().write_matrix(f"{name}.trans-inverse.txt")
        print(f"{name}: inliers {res.num_inliers}\t0\t0\t{ts.scale:f}")
        with open(out_report, "a+") as f:
            f.write(
                "%s:\tinliers\t%d\t%d\t%d\t%f\t%f\t%f\t%f\n"
                % (name, res.num_inliers, 0, 0, ts.scale, *ts.trans)
            )
        keyfile.write_text(f2, f"{name}.update.key")
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 2:
        print(__doc__)
        return -1

    with open("_command.txt", "wt") as f:
        f.write("featmatch " + " ".join(argv) + " \n")

    report = "report.txt"
    only_reoriented = True
    peaks_mode = 4
    neighbors = 5
    file_list = None
    all_to_all = False
    shard_match = False
    refine = False
    geometry_weight = -1.0
    i = 0
    while i < len(argv) and argv[i].startswith("-"):
        a = argv[i]
        if a in ("-o", "-O"):
            i += 1
            report = argv[i]
        elif a.startswith("-s") or a.startswith("-S"):
            peaks_mode = int(a[2:])
        elif a.startswith("-r") or a.startswith("-R"):
            only_reoriented = a[2:3] != "-"
        elif a in ("-n", "-N"):
            i += 1
            neighbors = int(argv[i])
        elif a in ("-f", "-F"):
            i += 1
            file_list = argv[i]
        elif a == "--all-to-all":
            all_to_all = True
        elif a == "--shard-match":
            # shard the group-vote kNN sweep over all visible devices —
            # the mesh analogue of the reference's OpenMP image chunks
            # (featMatchMultiple.cpp:9,108-117)
            shard_match = True
        elif a == "--refine":
            refine = True
        elif a in ("-g", "-G"):
            # geometry-augmented descriptors for group voting: xyz*weight
            # appended to the 64-d descriptors (the reference builds the
            # 67-d FLANN database at featMatchUtilities.cpp:1437-1442,
            # 1530-1539 but never parses a flag for it — exposed here)
            i += 1
            geometry_weight = float(argv[i])
        else:
            print(f"Error: unknown command line argument: {a}")
            return -1
        i += 1

    if shard_match and not all_to_all:
        # sharding applies to the group-vote kNN sweep only; say so
        # instead of silently running the pairwise path unsharded
        print(
            "Warning: --shard-match only affects --all-to-all group "
            "matching; pairwise matching runs unsharded."
        )

    names = read_lines(file_list) if file_list else argv[i:]
    labels = list(range(len(names)))

    with open("_names.txt", "wt") as f:
        for n, l in zip(names, labels):
            f.write(f"{n}\t{l}\n")

    import dataclasses

    cfg = dataclasses.replace(DEFAULT_CONFIG, knn_neighbors=neighbors)

    sets = []
    total = 0
    feat_type = "Peak and Valley"
    split_sets = ([], []) if peaks_mode == 2 else None
    for n in names:
        print(f"Reading file: {n}...", end="")
        feats, _ = keyfile.read_text(n, eig_threshold=cfg.eig_threshold)
        if only_reoriented:
            feats = feats.remove_non_reoriented()
        else:
            feats = feats.remove_reoriented()
        if peaks_mode == 0:
            feats = feats.remove_non_peak()
            feat_type = "Peaks"
        elif peaks_mode == 1:
            feats = feats.remove_non_valley()
            feat_type = "Valley"
        elif peaks_mode == 2:
            split_sets[0].append(feats.remove_non_valley())
            split_sets[1].append(feats.remove_non_peak())
        sets.append(feats)
        total += len(feats)
        print(f"feats: {len(feats)}, total: {total}")

    with open("feature_count.txt", "wt") as f:
        for j, s in enumerate(sets):
            f.write(f"{j}\t{len(s)}\n")

    open(report, "wt").close()
    match_all_to_one(names, sets, report, cfg, refine)
    if peaks_mode == 2:
        match_all_to_one(names, split_sets[0], report, cfg, refine)
        match_all_to_one(names, split_sets[1], report, cfg, refine)

    if all_to_all:
        # empty per-match debug log, created when the search structure is
        # built in the reference (featMatchUtilities.cpp:1561)
        groupvote.touch_report_all()
        mesh = None
        if shard_match:
            from sift3d.dist.mesh import make_mesh

            mesh = make_mesh()  # all devices on the "batch" axis
        gm = groupvote.GroupMatcher(sets, labels, geometry_weight, cfg, mesh=mesh)
        res = gm.match_all_to_all()
        groupvote.write_vote_files(res, tag=feat_type)
        if peaks_mode == 2:
            for tag, ss in (("Valley", split_sets[0]), ("Peaks", split_sets[1])):
                gm = groupvote.GroupMatcher(ss, labels, geometry_weight, cfg, mesh=mesh)
                groupvote.write_vote_files(gm.match_all_to_all(), tag=tag, append=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
