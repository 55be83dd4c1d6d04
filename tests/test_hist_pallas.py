"""Pallas splat-histogram kernel vs the XLA contraction and splat oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from sift3d.core.config import DEFAULT_CONFIG
from sift3d.kernels.gauss import gaussian_kernel_1d
from sift3d.kernels.hist_pallas import smooth_histogram_pallas, splat_histogram_raw
from sift3d.pipeline import features as F


@pytest.fixture()
def coords():
    rng = np.random.default_rng(17)
    c, v = 13, 333  # deliberately unaligned: exercises C and V padding
    # unit directions scaled into the histogram like canonical_stage does,
    # plus a sprinkle of exact border values (saturation path)
    e = rng.standard_normal((c, v, 3)).astype(np.float32)
    e /= np.maximum(np.linalg.norm(e, axis=-1, keepdims=True), 1e-6)
    xyz = e * 5.0 + 5.5
    xyz[:, :5] = np.float32([0.2, 10.6, 5.5])  # clamp-low / clamp-high / center
    w = np.abs(rng.standard_normal((c, v))).astype(np.float32)
    w[:, -7:] = 0.0
    return xyz, w


def test_raw_splat_matches_oracle(coords):
    xyz, w = coords
    got = np.asarray(
        splat_histogram_raw(
            jnp.asarray(xyz[..., 0]), jnp.asarray(xyz[..., 1]),
            jnp.asarray(xyz[..., 2]), jnp.asarray(w), interpret=True,
        )
    )
    want = np.asarray(F._splat_histogram(jnp.asarray(xyz), jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_peaks_matches_xla_path(coords):
    """smooth_histogram_peaks (fused blur + strict-peak mask) and the
    p-layout top-k/interp helpers vs the [C, 11, 11, 11] XLA chain."""
    import jax.lax

    xyz, w = coords
    taps = tuple(
        float(t) for t in gaussian_kernel_1d(DEFAULT_CONFIG.ori_hist_blur_sigma, 0.01)
    )
    from sift3d.kernels.hist_pallas import smooth_histogram_peaks

    hb, pk = smooth_histogram_peaks(
        jnp.asarray(xyz[..., 0]), jnp.asarray(xyz[..., 1]),
        jnp.asarray(xyz[..., 2]), jnp.asarray(w), taps, interpret=True,
    )
    hist = F._smooth_histogram_axes(
        jnp.asarray(xyz[..., 0]), jnp.asarray(xyz[..., 1]),
        jnp.asarray(xyz[..., 2]), jnp.asarray(w),
        DEFAULT_CONFIG.ori_hist_blur_sigma,
    )
    # blurred histogram matches (p-layout slice = natural reshape)
    c = hist.shape[0]
    hb_nat = np.asarray(hb)[:, :121, :11].reshape(c, 11, 11, 11)
    np.testing.assert_allclose(hb_nat, np.asarray(hist), rtol=2e-5, atol=2e-5)

    k = 6
    v_a, pz_a, py_a, px_a, ok_a = F._top_peaks_pf(pk, k)
    v_b, pz_b, py_b, px_b, ok_b = F._top_peaks(hist, k)
    np.testing.assert_array_equal(np.asarray(ok_a), np.asarray(ok_b))
    np.testing.assert_allclose(np.asarray(v_a), np.asarray(v_b), rtol=2e-5, atol=2e-5)
    both = np.asarray(ok_a)
    for a, b in ((pz_a, pz_b), (py_a, py_b), (px_a, px_b)):
        np.testing.assert_array_equal(np.asarray(a)[both], np.asarray(b)[both])

    itp_a = np.asarray(F._interp_hist_peaks_pf(hb, pz_a, py_a, px_a))
    itp_b = np.asarray(F._interp_hist_peaks(hist, pz_b, py_b, px_b))
    np.testing.assert_allclose(itp_a[both], itp_b[both], rtol=2e-4, atol=2e-4)


def test_canonical_stage_pallas_path_matches_xla():
    """Full canonical_stage through the Pallas path (interpret mode) vs
    the XLA path: same validity mask, close orientations."""
    rng = np.random.default_rng(3)
    pn = jnp.asarray(rng.standard_normal((37, 11, 11, 11)).astype(np.float32))
    want = F.canonical_stage(pn, DEFAULT_CONFIG)
    F.canonical_stage.clear_cache()  # the interpret hook isn't a cache key
    F._HIST_PALLAS_INTERPRET = True
    try:
        got = F.canonical_stage(pn, DEFAULT_CONFIG)
    finally:
        F._HIST_PALLAS_INTERPRET = False
        F.canonical_stage.clear_cache()
    np.testing.assert_array_equal(
        np.asarray(got["ori_valid"]), np.asarray(want["ori_valid"])
    )
    valid = np.asarray(want["ori_valid"])
    np.testing.assert_allclose(
        np.asarray(got["ori"])[valid], np.asarray(want["ori"])[valid],
        rtol=1e-3, atol=1e-3,
    )


def test_smooth_histogram_matches_xla(coords):
    xyz, w = coords
    taps = gaussian_kernel_1d(DEFAULT_CONFIG.ori_hist_blur_sigma, 0.01)
    got = np.asarray(
        smooth_histogram_pallas(
            jnp.asarray(xyz[..., 0]), jnp.asarray(xyz[..., 1]),
            jnp.asarray(xyz[..., 2]), jnp.asarray(w), taps, interpret=True,
        )
    )
    want = np.asarray(
        F._smooth_histogram_axes(
            jnp.asarray(xyz[..., 0]), jnp.asarray(xyz[..., 1]),
            jnp.asarray(xyz[..., 2]), jnp.asarray(w),
            DEFAULT_CONFIG.ori_hist_blur_sigma,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_topk_kernel_matches_split_path(coords):
    """smooth_histogram_topk (fused splat+blur+peak+top-k+neighbors) vs the
    split smooth_histogram_peaks + _top_peaks_pf + _interp_hist_peaks_pf
    composition: same peak set, same tie order, same interpolations."""
    from sift3d.kernels.hist_pallas import smooth_histogram_peaks, smooth_histogram_topk

    xyz, w = coords
    taps = tuple(float(t) for t in gaussian_kernel_1d(0.5, 0.01))
    k = 6
    args = (
        jnp.asarray(xyz[..., 0]), jnp.asarray(xyz[..., 1]),
        jnp.asarray(xyz[..., 2]), jnp.asarray(w),
    )
    out = np.asarray(smooth_histogram_topk(*args, taps, k, interpret=True))
    hb, pk = smooth_histogram_peaks(*args, taps, interpret=True)
    v_b, pz_b, py_b, px_b, ok_b = F._top_peaks_pf(pk, k)
    itp_b = F._interp_hist_peaks_pf(hb, pz_b, py_b, px_b)

    ok_a = np.isfinite(out[..., 0])
    np.testing.assert_array_equal(ok_a, np.asarray(ok_b))
    np.testing.assert_allclose(
        out[..., 0][ok_a], np.asarray(v_b)[ok_a], rtol=1e-6, atol=1e-6
    )
    flat = out[..., 7].astype(np.int64)
    px_a, pp = flat % 16, flat // 16
    pz_a, py_a = pp // 11, pp % 11
    for a, b in ((pz_a, pz_b), (py_a, py_b), (px_a, px_b)):
        np.testing.assert_array_equal(a[ok_a], np.asarray(b)[ok_a])
    # neighbor values feed the same quadratic interp -> same coordinates
    hb_np = np.asarray(hb).reshape(out.shape[0], -1)
    rows = np.arange(out.shape[0])[:, None]
    for lane, off in ((1, -1), (2, 1), (3, -16), (4, 16), (5, -176), (6, 176)):
        want = hb_np[rows, np.clip(flat + off, 0, hb_np.shape[1] - 1)]
        np.testing.assert_allclose(
            out[..., lane][ok_a], want[ok_a], rtol=1e-6, atol=1e-6
        )
    del itp_b  # the interp composition is covered by test_canonical_stage_*


def test_topk_kernel_count_skip(coords):
    """Rows past the live count are skipped; rows below it are intact."""
    from sift3d.kernels.hist_pallas import smooth_histogram_topk

    xyz, w = coords
    taps = tuple(float(t) for t in gaussian_kernel_1d(0.5, 0.01))
    args = (
        jnp.asarray(xyz[..., 0]), jnp.asarray(xyz[..., 1]),
        jnp.asarray(xyz[..., 2]), jnp.asarray(w),
    )
    full = np.asarray(smooth_histogram_topk(*args, taps, 4, interpret=True))
    cnt = 9
    part = np.asarray(
        smooth_histogram_topk(*args, taps, 4, count=jnp.int32(cnt), interpret=True)
    )
    np.testing.assert_array_equal(part[:cnt], full[:cnt])


def test_canonical_stage_kvalid_masks_secondaries():
    """canonical_stage(kvalid=...) must agree with the unmasked stage on
    surviving rows (dead rows' ori_valid becomes False)."""
    rng = np.random.default_rng(5)
    pn = jnp.asarray(rng.standard_normal((21, 11, 11, 11)).astype(np.float32))
    kvalid = jnp.asarray(rng.uniform(size=21) < 0.5)
    want = F.canonical_stage(pn, DEFAULT_CONFIG)
    got = F.canonical_stage(pn, DEFAULT_CONFIG, kvalid)
    kv = np.asarray(kvalid)
    np.testing.assert_array_equal(
        np.asarray(got["ori_valid"])[kv], np.asarray(want["ori_valid"])[kv]
    )
    assert not np.asarray(got["ori_valid"])[~kv].any()
    both = np.asarray(got["ori_valid"]) & np.asarray(want["ori_valid"])
    np.testing.assert_allclose(
        np.asarray(got["ori"])[both], np.asarray(want["ori"])[both],
        rtol=1e-6, atol=1e-6,
    )
