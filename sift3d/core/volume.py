"""Volume: the dense-array successor of the reference's FEATUREIO struct.

The reference FEATUREIO (src_common/FeatureIO.h:21-33) carries x/y/z/t dims,
a features-per-voxel count and *dual* host/device pointers with explicit
H2D/D2H copies around every op. On TPU none of that exists: a Volume is a
single HBM-resident ``jax.Array`` in [Z, Y, X] layout plus voxel-size /
affine metadata, and every op is a functional transform of it.

Coordinate conventions (must match the reference exactly for parity):

- voxel (x, y, z) indexes ``data[z, y, x]``,
- continuous coordinates follow the reference's 0.5-voxel-center rule
  (FeatureIO.cpp:752-781 `_fioDetermineInterpCoord`): continuous coord
  ``c`` = voxel center of index ``i`` when ``c == i + 0.5``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Volume:
    """A 3D scalar volume with spatial metadata.

    Attributes:
      data: [Z, Y, X] array (float32 on device or numpy on host).
      voxel_size: (dx, dy, dz) in mm.
      qto_xyz: 4x4 voxel-to-world transform (NIfTI qform), or None.
      sto_xyz: 4x4 voxel-to-world transform (NIfTI sform), or None.
      sform_code: NIfTI sform code (0 when absent).
    """

    data: jnp.ndarray
    voxel_size: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    qto_xyz: Optional[np.ndarray] = None
    sto_xyz: Optional[np.ndarray] = None
    sform_code: int = 0

    @property
    def shape_zyx(self) -> Tuple[int, int, int]:
        return tuple(self.data.shape)  # type: ignore[return-value]

    @property
    def shape_xyz(self) -> Tuple[int, int, int]:
        z, y, x = self.data.shape
        return (x, y, z)

    def astype(self, dtype) -> "Volume":
        return dataclasses.replace(self, data=self.data.astype(dtype))

    def with_data(self, data) -> "Volume":
        return dataclasses.replace(self, data=data)

    def world_matrix(self, use_sform: bool = False) -> np.ndarray:
        """Voxel-to-world 4x4 (qform by default; sform when requested and valid).

        Mirrors featExtract.cpp:447-458: `-ws` prefers sto_xyz when
        sform_code > 0, else falls back to qto_xyz.
        """
        if use_sform and self.sform_code > 0 and self.sto_xyz is not None:
            return np.asarray(self.sto_xyz, dtype=np.float64)
        if self.qto_xyz is not None:
            return np.asarray(self.qto_xyz, dtype=np.float64)
        m = np.eye(4, dtype=np.float64)
        m[0, 0], m[1, 1], m[2, 2] = self.voxel_size
        return m

    @staticmethod
    def from_array(arr, voxel_size=(1.0, 1.0, 1.0)) -> "Volume":
        return Volume(data=jnp.asarray(arr, dtype=jnp.float32), voxel_size=tuple(voxel_size))
