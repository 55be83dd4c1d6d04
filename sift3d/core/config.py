"""Typed configuration for the whole engine.

The reference scatters its algorithm constants across compile-time defines
and globals (see SURVEY.md section 5); here they live in one frozen
dataclass so every stage is driven by explicit, testable configuration.

Reference provenance of each default (paths relative to
/root/reference/3dsift_cleanup-softVote_App_Weight_SoftMax):

- blurs_per_octave=3, blurs_extra=3    src_common/MultiScale.cpp:50-52
- blur_precision=0.01                  src_common/MultiScale.cpp:42
- sigma_base=1.6, sigma_init=0.5       src_common/MultiScale.cpp:288-291
- ori_hist_blur_sigma=0.5              src_common/MultiScale.cpp:37
- ori_peak_threshold=0.8               src_common/MultiScale.cpp:2889
- ori_2nd_peak_threshold=0.5           src_common/MultiScale.cpp:40
- max_orientations=30 (effective 11)   src_common/MultiScale.cpp:1823-1824,2862
- eig_threshold=140                    featExtract/featExtract.cpp:297
- patch_dim=11                         src_common/MultiScale.h:137
- descriptor_size=64                   src_common/MultiScale.h:38
- brief_blur_sigma=0.95                src_common/MultiScale.cpp:1032
- hough thresholds 1.0/2.0/0.7         feat_common/featMatchUtilities.cpp:918-920
- ratio-test compat log(1.5)/0.5       feat_common/featMatchUtilities.cpp:12,64-65
- max_matches=3000                     feat_common/featMatchUtilities.cpp:1103
- knn neighbors=5                      featMatchMultiple/featMatchMultiple.cpp:430
- softmax eta=1                        feat_common/featMatchUtilities.cpp:1721-1730
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class SiftConfig:
    # ---- scale-space pyramid ----
    blurs_per_octave: int = 3
    blurs_extra: int = 3
    blur_precision: float = 0.01
    # MXU precision of the banded blur matmuls: "highest" (full f32,
    # the default since round 5) or "high" (bf16x3, ~1e-6 relative).
    # bf16x3 flips tie-margin extrema — false extrema on -2+ doubled
    # volumes and resampled -w volumes (f64-probe-attributed, rounds
    # 4-5) and ~6% of keypoints in the dense regime (PARITY_r05_dense)
    # — while HIGHEST measured free end-to-end (the blur chain is
    # bandwidth-bound). None (default) defers to the
    # SIFT3D_BLUR_MATMUL_PRECISION env default in kernels/gauss.py
    # ("highest" unless overridden).
    blur_matmul_precision: "str | None" = None
    sigma_base: float = 1.6
    sigma_init: float = 0.5
    min_octave_dim: int = 3  # octave stops when any dim <= 2

    # ---- feature geometry ----
    patch_dim: int = 11
    eig_threshold: float = 140.0
    # image sampling radius is 2x feature scale (MultiScale.cpp:2630)
    patch_scale_factor: float = 2.0

    # ---- orientation assignment ----
    ori_hist_blur_sigma: float = 0.5
    ori_peak_threshold: float = 0.8
    ori_2nd_peak_threshold: float = 0.5
    max_orientations: int = 11  # loop caps at FEATURE_3D_DIM (MultiScale.cpp:2862)
    # batched capacities (TPU-side fixed shapes). The reference bounds the
    # TOTAL emitted copies at 11 (iOrientationsReturned < fioImg.z,
    # MultiScale.cpp:2981) but neither primaries examined (<= 11,
    # MultiScale.cpp:2862) nor secondaries per primary: k2 = 11 makes the
    # per-primary envelope exact under the total cap (a single primary with
    # 7 secondary peaks was measured on real data — PARITY r3). k1 = 6 is a
    # capacity approximation: > 6 strict-peak primaries all >= 0.8 * max in
    # one blurred 11^3 histogram has never been observed; raise it for
    # bit-exact emission in that regime at ~2x canonical-stage capacity.
    max_primary_orientations: int = 6
    max_secondary_orientations: int = 11

    # ---- descriptors ----
    descriptor_size: int = 64
    goh_spatial_bins: int = 2
    goh_orientation_bins: int = 8
    brief_blur_sigma: float = 0.95
    brief_method: int = 2  # default pair table (MultiScale.cpp:803)

    # ---- candidate capacities (fixed shapes under jit) ----
    max_candidates_per_level: int = 8192
    feature_chunk: int = 1024
    # chunk cap for union (multi-volume) feature programs; larger than
    # feature_chunk because one program serves the whole batch (the boxed
    # gather transient is chunk x 256 KB, so 4096 -> ~1 GB HBM)
    union_chunk: int = 4096

    # ---- matching ----
    knn_neighbors: int = 5
    max_matches: int = 3000
    ratio_compat_log_scale: float = math.log(1.5)
    ratio_compat_shift: float = 0.5
    hough_thres_scale: float = 1.0
    hough_thres_trans: float = 2.0
    hough_thres_orien: float = 0.7
    softvote_eta: float = 1.0

    # ---- numerics ----
    dtype: str = "float32"

    @property
    def blurs_total(self) -> int:
        return self.blurs_per_octave + self.blurs_extra

    @property
    def sigma_factor(self) -> float:
        return float(2.0 ** (1.0 / self.blurs_per_octave))

    def level_sigmas(self) -> list:
        """Blur sigma of each pyramid level within an octave.

        ``sigmas[j] = sigma_base * sigma_factor**j`` for j in [0, blurs_total).
        Matches pfBlurSigmas in MultiScale.cpp:318-527.
        """
        return [self.sigma_base * self.sigma_factor**j for j in range(self.blurs_total)]

    def incremental_sigmas(self) -> list:
        """Extra blur applied between consecutive levels.

        sigma_extra[j] = sigmas[j-1] * sqrt(factor^2 - 1), the amount needed
        to raise level j-1 to level j (MultiScale.cpp:369).
        """
        f2 = self.sigma_factor * self.sigma_factor
        return [s * math.sqrt(f2 - 1.0) for s in self.level_sigmas()[:-1]]


DEFAULT_CONFIG = SiftConfig()
