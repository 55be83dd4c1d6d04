"""tpu-sift3d: a TPU-native 3D SIFT feature engine (JAX/XLA/Pallas).

A from-scratch reimplementation of the capabilities of the CUDA reference
``CarluerJB/3D_SIFT_CUDA`` (arXiv:2112.10258), redesigned for TPU:

- dense volume ops (Gaussian scale space, DoG, resampling, extrema stencils)
  run as XLA/MXU programs over HBM-resident volumes,
- the ragged feature stage (subvoxel refinement, orientation assignment,
  descriptors) runs as fixed-capacity batched programs,
- matching runs as tiled exact distance matrices on the MXU instead of
  FLANN kd-trees,
- scaling is expressed with ``jax.sharding`` meshes: volume-batch data
  parallelism, halo-exchange spatial partitioning, and collective-based
  group matching.

Layer map (mirrors SURVEY.md section 7):

- :mod:`sift3d.core`      volume container + configuration
- :mod:`sift3d.io`        NIfTI-1 reader/writer, .key feature files
- :mod:`sift3d.kernels`   dense device kernels
- :mod:`sift3d.pipeline`  scale-space pyramid + feature extraction
- :mod:`sift3d.match`     pairwise + group-wise matching, registration
- :mod:`sift3d.dist`      device-mesh scaling (DP, halo exchange, gather)
- :mod:`sift3d.cli`       flag-compatible command line tools
"""

__version__ = "0.1.0"

from sift3d.core.config import SiftConfig  # noqa: F401
from sift3d.core.volume import Volume  # noqa: F401
