""".key feature file IO — byte-compatible with the reference text format.

Format (writer msFeature3DVectorOutputText, src_common/MultiScale.h:386-474;
reader msFeature3DVectorInputText, MultiScale.h:305-384):

    # featExtract 1.1
    # <optional comment lines>
    Features: N
    Scale-space location[x y z scale] orientation[o11 ... o32] 2nd moment
        eigenvalues[e1 e2 e3] info flag[i1] descriptor[d1 .. d64]
    x<TAB>y<TAB>z<TAB>scale<TAB>o11..o33<TAB>e1 e2 e3<TAB>info<TAB>d1..d64<TAB>\n

Floats print as C "%f" (6 decimals); descriptor values print as
(char)-cast integers (after rank normalization they are 0..63). The
eigenvalue threshold is re-applied at write time (MultiScale.h:407-414).

A binary variant mirrors msFeature3DVectorOutputBin (MultiScale.h:228-303).
"""

from __future__ import annotations

import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np

from sift3d.core.featureset import DESCRIPTOR_SIZE, FeatureSet

HEADER_LINE = "# featExtract 1.1"
LEGEND_LINE = (
    "Scale-space location[x y z scale] orientation[o11 o12 o13 o21 o22 o23 o31 o32 o32] "
    "2nd moment eigenvalues[e1 e2 e3] info flag[i1] descriptor[d1 .. d64]"
)


def _fmt(v: float) -> str:
    return "%f" % float(v)


def write_text(
    feats: FeatureSet,
    path: str,
    eig_threshold: float = -1.0,
    comments: Optional[Sequence[str]] = None,
    use_native: bool = True,
) -> int:
    """Write features; returns the number written after eig filtering.

    Uses the C++ fast path (sift3d.io.native) when the toolchain is
    available; the pure-Python writer below is the byte-identical fallback.
    """
    if use_native:
        from sift3d.io import native

        n = native.write_key_text(feats, path, eig_threshold, comments)
        if n is not None:
            return n
    keep = feats.eig_mask(eig_threshold)
    idx = np.nonzero(keep)[0]
    lines: List[str] = [HEADER_LINE]
    for c in comments or []:
        lines.append("# " + c)
    lines.append("Features: %d" % len(idx))
    lines.append(LEGEND_LINE)
    for i in idx:
        parts = [_fmt(feats.xyz[i, 0]), _fmt(feats.xyz[i, 1]), _fmt(feats.xyz[i, 2]), _fmt(feats.scale[i])]
        parts += [_fmt(feats.ori[i, r, c]) for r in range(3) for c in range(3)]
        parts += [_fmt(feats.eigs[i, j]) for j in range(3)]
        parts.append(str(int(feats.info[i])))
        # (char) cast of the float descriptor value (MultiScale.h:467):
        # truncation toward zero then wrap to signed 8-bit.
        desc_int = feats.desc[i].astype(np.int64)
        desc_int = ((desc_int + 128) % 256) - 128
        parts += [str(int(v)) for v in desc_int]
        lines.append("\t".join(parts) + "\t")
    with open(path, "wt") as f:
        f.write("\n".join(lines) + "\n")
    return len(idx)


def read_text(
    path: str, eig_threshold: float = -1.0, use_native: bool = True
) -> Tuple[FeatureSet, List[str]]:
    """Read a .key text file; returns (features, comment lines).

    Like the reference reader, comment lines are skipped and the feature
    count line is parsed; unlike the reference we also return comments so
    callers can inspect the coordinate-space header. The eig threshold is
    applied after reading (featMatchMultiple.cpp:596 passes 140 -- note the
    reference reader accepts it but applies no filter; we apply it to honor
    the intent; pass -1 for raw reads).
    """
    comments: List[str] = []
    with open(path, "rt") as f:
        line = f.readline()
        while line.startswith("#"):
            comments.append(line[1:].strip())
            line = f.readline()
        if not line.startswith("Features:"):
            raise ValueError(f"{path}: missing 'Features:' line")
        n = int(line.split(":", 1)[1])
        legend = f.readline()
        if "Scale-space location[x y z scale]" not in legend:
            raise ValueError(f"{path}: missing legend line")
        if use_native:
            from sift3d.io import native

            feats = native.read_key_text(path)
            if feats is not None:
                if eig_threshold >= 0:
                    feats = feats.apply_eig_threshold(eig_threshold)
                return feats, comments
        data = np.loadtxt(f, dtype=np.float64, max_rows=n, ndmin=2)
    if data.size == 0:
        return FeatureSet.empty(0), comments
    if data.shape[1] != 4 + 9 + 3 + 1 + DESCRIPTOR_SIZE:
        raise ValueError(f"{path}: unexpected column count {data.shape[1]}")
    feats = FeatureSet(
        xyz=data[:, 0:3].astype(np.float32),
        scale=data[:, 3].astype(np.float32),
        ori=data[:, 4:13].reshape(-1, 3, 3).astype(np.float32),
        eigs=data[:, 13:16].astype(np.float32),
        info=data[:, 16].astype(np.uint32),
        desc=data[:, 17:].astype(np.float32),
    )
    if eig_threshold >= 0:
        feats = feats.apply_eig_threshold(eig_threshold)
    return feats, comments


_BIN_RECORD = np.dtype(
    [
        ("geom", "<f4", 4),  # x y z scale
        ("ori", "<f4", 9),
        ("eigs", "<f4", 3),
        ("info", "<u4"),
        ("desc", "u1", DESCRIPTOR_SIZE),
    ]
)


def write_binary(feats: FeatureSet, path: str, eig_threshold: float = -1.0) -> int:
    """Binary variant (writer msFeature3DVectorOutputBin, MultiScale.h:228-303):
    text header then packed records of 16 floats + uint32 + 64 uint8
    descriptor bytes."""
    keep = feats.eig_mask(eig_threshold)
    idx = np.nonzero(keep)[0]
    with open(path, "wb") as f:
        f.write(("# featExtract 1.1\n").encode())
        f.write(("Features: %d\n" % len(idx)).encode())
        for i in idx:
            f.write(struct.pack("<4f", *feats.xyz[i], feats.scale[i]))
            f.write(struct.pack("<9f", *feats.ori[i].reshape(9)))
            f.write(struct.pack("<3f", *feats.eigs[i]))
            f.write(struct.pack("<I", int(feats.info[i])))
            f.write(feats.desc[i].astype(np.uint8).tobytes())
    return len(idx)


def read_binary(path: str, eig_threshold: float = -1.0) -> FeatureSet:
    """Read a binary .key file written by write_binary (or the reference's
    msFeature3DVectorOutputBin, MultiScale.h:228-303 — the reference ships
    no binary reader of its own, so this completes the round trip)."""
    with open(path, "rb") as f:
        line = f.readline()
        while line.startswith(b"#"):
            line = f.readline()
        if not line.startswith(b"Features:"):
            raise ValueError(f"{path}: missing 'Features:' line")
        n = int(line.split(b":", 1)[1])
        recs = np.frombuffer(f.read(n * _BIN_RECORD.itemsize), dtype=_BIN_RECORD, count=n)
    feats = FeatureSet(
        xyz=recs["geom"][:, 0:3].astype(np.float32).copy(),
        scale=recs["geom"][:, 3].astype(np.float32).copy(),
        ori=recs["ori"].reshape(-1, 3, 3).astype(np.float32).copy(),
        eigs=recs["eigs"].astype(np.float32).copy(),
        info=recs["info"].astype(np.uint32).copy(),
        desc=recs["desc"].astype(np.float32).copy(),
    )
    if eig_threshold >= 0:
        feats = feats.apply_eig_threshold(eig_threshold)
    return feats
