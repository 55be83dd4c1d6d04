"""Pallas orientation-histogram kernel: trilinear splat as VMEM matmuls.

The canonical-orientation stage builds blurred 11^3 spherical histograms
from ~700 weighted gradient directions per candidate
(determineCanonicalOrientation3D, MultiScale.cpp:2722-3037). The XLA
formulation (features._smooth_histogram_axes) factorizes splat+blur into
per-axis [C, V, 11] matrices and contracts them on the MXU — correct,
but the [C, V, 121] in-plane outer product is an HBM transient: ~2.8 GB
of traffic per call at C=4096, ~6.5 ms, and the histogram is called
(1 + K1) times per phase-2b chunk (~45 ms of the ~180 ms phase).

This kernel keeps the outer product in VMEM. Per candidate c:

  P[p, v]  = wz(v, p//11) * wy(v, p%11) * w[v]     (p = z*11 + y, 128 lanes)
  AX[v, x] = wx(v, x)                              (x on 16 lanes)
  raw[c]   = P @ AX                                (native-layout MXU matmul)

where wz/wy/wx are the 2-sparse trilinear splat factors (0.5-center,
border-saturating — exactly resample._interp_coord). The Gaussian blur
is applied OUTSIDE on the tiny [C, 1331] result as three banded [11, 11]
matmuls: blur3d(splat(...)) == splat factored per axis, so this is
algebraically identical to the XLA path (fp reduction order differs).

HBM traffic: 4 [C, V] inputs + the [C, 1331] output — ~35 MB/call
instead of ~2.8 GB.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH_DIM = 11
_P_LANES = 128  # >= 11 * 11 = 121 (z*11 + y)
_X_LANES = 16  # >= 11


def blur_band_matrix(blur_taps) -> np.ndarray:
    """[11, 11] zero-padded 1D Gaussian blur as a banded matrix.

    Column o holds the taps that output bin o reads (zero beyond the
    histogram edges), matching gb3d_blur3d's zero-border FIR on the
    orientation histogram (MultiScale.cpp:2850)."""
    r = len(blur_taps) // 2
    b = np.zeros((PATCH_DIM, PATCH_DIM), np.float32)
    taps = np.asarray(blur_taps, np.float32)
    for o in range(PATCH_DIM):
        lo, hi = max(0, o - r), min(PATCH_DIM, o + r + 1)
        b[lo:hi, o] = taps[lo - o + r : hi - o + r]
    return b


def _interp_coord_11(c):
    """resample._interp_coord for dim=11 (kept inline: the kernel cannot
    import the jnp version's host-side branches). i in [0, 9]; border
    coordinates saturate via the weight, never via an out-of-range bin."""
    ch = c - 0.5
    i = jnp.clip(jnp.floor(ch).astype(jnp.int32), 0, PATCH_DIM - 2)
    w = 1.0 - (ch - i.astype(ch.dtype))
    w = jnp.where(c < 0.5, 1.0, w)
    w = jnp.where(c >= PATCH_DIM - 0.5, 0.0, w)
    return i, w


def _splat_one(cz_row, cy_row, w_row, cx_row, zb, yb, sub_x):
    """One candidate's raw splat histogram [128(p=z*11+y), 16(x)]."""
    i0z, w0z = _interp_coord_11(cz_row)  # [1, Vp]
    i0y, w0y = _interp_coord_11(cy_row)
    pz = w0z * (zb == i0z) + (1.0 - w0z) * (zb == i0z + 1)
    py = w0y * (yb == i0y) + (1.0 - w0y) * (yb == i0y + 1)
    p = pz * py * w_row  # [128(p), Vp]
    i0x, w0x = _interp_coord_11(cx_row)
    axt = w0x * (sub_x == i0x) + (1.0 - w0x) * (sub_x == i0x + 1)
    return jax.lax.dot_general(
        p, axt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _iotas(vp):
    lane_p = jax.lax.broadcasted_iota(jnp.int32, (_P_LANES, vp), 0)
    zb = lane_p // PATCH_DIM  # rows 121..127 -> z = 11: never matched
    yb = lane_p % PATCH_DIM
    sub_x = jax.lax.broadcasted_iota(jnp.int32, (_X_LANES, vp), 0)
    return zb, yb, sub_x


def _hist_kernel(cz_ref, cy_ref, w_ref, cx_ref, out_ref):
    zb, yb, sub_x = _iotas(cz_ref.shape[1])
    for c in range(cz_ref.shape[0]):
        out_ref[c] = _splat_one(
            cz_ref[c : c + 1, :], cy_ref[c : c + 1, :], w_ref[c : c + 1, :],
            cx_ref[c : c + 1, :], zb, yb, sub_x,
        )


def _interior_mask():
    """[128, 16] bool: interior (1..9 per axis) histogram positions."""
    pi = jax.lax.broadcasted_iota(jnp.int32, (_P_LANES, _X_LANES), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (_P_LANES, _X_LANES), 1)
    z, y = pi // PATCH_DIM, pi % PATCH_DIM
    good = (z >= 1) & (z <= PATCH_DIM - 2) & (y >= 1) & (y <= PATCH_DIM - 2)
    return good & (xi >= 1) & (xi <= PATCH_DIM - 2)


def _hist_peaks_kernel(cz_ref, cy_ref, w_ref, cx_ref, wt_ref, bx_ref,
                       hb_ref, pk_ref):
    """Fused splat + blur + strict-peak mask, entirely in the [128(p),
    16(x)] layout. The naive XLA path runs the blur/peak elementwise ops
    on [C, 11, 11, 11] arrays whose 11-wide minor dim uses 11 of 128
    lanes (~9% VPU utilization) — composed, that cost ~35 ms of the
    ~50 ms canonical stage per 4096-candidate chunk."""
    zb, yb, sub_x = _iotas(cz_ref.shape[1])
    interior = _interior_mask()
    neg = jnp.float32(-jnp.inf)
    for c in range(cz_ref.shape[0]):
        raw = _splat_one(
            cz_ref[c : c + 1, :], cy_ref[c : c + 1, :], w_ref[c : c + 1, :],
            cx_ref[c : c + 1, :], zb, yb, sub_x,
        )
        # separable blur as two constant matmuls: x via the [16, 16]
        # banded matrix, (z, y) jointly via the [128, 128] transposed
        # Kronecker band W^T[q, p] = B[z(p), z(q)] * B[y(p), y(q)]
        hbx = jax.lax.dot_general(
            raw, bx_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        hb = jax.lax.dot_general(
            wt_ref[:], hbx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        hb_ref[c] = hb
        # strict 26-neighbor peaks, factored: the x-max (2 lane rolls) is
        # shared by all 8 nonzero (dz, dy) sublane offsets (interior-only,
        # so p +- dz*11+dy is the true neighbor; wrap garbage lands
        # outside the interior mask). 10 rolls instead of 26.
        xm = pltpu.roll(hb, _X_LANES - 1, 1)
        xp = pltpu.roll(hb, 1, 1)
        mx3 = jnp.maximum(hb, jnp.maximum(xm, xp))
        m = jnp.maximum(xm, xp)  # the (0, 0, +-1) neighbors
        for dzy in (-12, -11, -10, -1, 1, 10, 11, 12):
            m = jnp.maximum(m, pltpu.roll(mx3, (-dzy) % _P_LANES, 0))
        pk_ref[c] = jnp.where((hb > m) & interior, hb, neg)


@functools.partial(jax.jit, static_argnames=("interpret",))
def splat_histogram_raw(cx, cy, cz, weights, interpret: bool = False):
    """Unblurred trilinear splat histograms on the MXU.

    cx/cy/cz: [C, V] continuous coordinates (0.5-center); weights [C, V].
    Returns [C, 11, 11, 11] float32. Equivalent to
    features._splat_histogram (fp reduction order differs).
    """
    c = cx.shape[0]
    bc = 8
    # padding columns carry weight 0, so they contribute exactly 0
    (cz_p, cy_p, w_p, cx_p), cp, vp = _pad_inputs(cx, cy, cz, weights, bc)

    raw = pl.pallas_call(
        _hist_kernel,
        out_shape=jax.ShapeDtypeStruct((cp, _P_LANES, _X_LANES), jnp.float32),
        grid=(cp // bc,),
        in_specs=[
            pl.BlockSpec((bc, vp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, vp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, vp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, vp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bc, _P_LANES, _X_LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(cz_p, cy_p, w_p, cx_p)
    raw = raw[:c, : PATCH_DIM * PATCH_DIM, :PATCH_DIM]
    return raw.reshape(c, PATCH_DIM, PATCH_DIM, PATCH_DIM)


def _pad_inputs(cx, cy, cz, weights, bc):
    c, v = cx.shape
    vp = (v + 127) // 128 * 128
    cp = (c + bc - 1) // bc * bc
    out = []
    for a in (cz, cy, weights, cx):
        out.append(jnp.pad(a.astype(jnp.float32), ((0, cp - c), (0, vp - v))))
    return out, cp, vp


_TOPK_LANES = 16  # output row: val, 6 neighbors, flat index, padding
_BIG_IDX = 1 << 20


def _hist_topk_kernel(cnt_ref, cz_ref, cy_ref, w_ref, cx_ref, wt_ref, bx_ref,
                      out_ref, *, k: int):
    """Fused splat + blur + strict-peak + top-k + neighbor extraction.

    smooth_histogram_peaks materializes [C, 128, 16] hb/pk buffers that
    XLA then feeds through lax.top_k and one-hot interpolation einsums —
    at phase-2b scale (C*(1+K1) rows per chunk) those buffers and the
    top_k are most of the canonical stage's device time. Here the peaks
    are extracted inside the kernel (iterative max + first-index, the
    exact tie order lax.top_k uses) and only [C, k, 16] peak rows leave
    VMEM: lane 0 = peak value, lanes 1-6 = the +-1 neighbors along
    x/y/z (for the quadratic subvoxel interpolation), lane 7 = the flat
    p*16+x position. Rows past the live count (cnt_ref) skip their
    compute entirely — the canonical stage compacts secondary-histogram
    rows to a live prefix, so dead (invalid-primary) rows cost nothing.
    """
    i = pl.program_id(0)
    bc = cz_ref.shape[0]

    @pl.when(i * bc < cnt_ref[0])
    def _():
        zb, yb, sub_x = _iotas(cz_ref.shape[1])
        interior = _interior_mask()
        pi = jax.lax.broadcasted_iota(jnp.int32, (_P_LANES, _X_LANES), 0)
        xi = jax.lax.broadcasted_iota(jnp.int32, (_P_LANES, _X_LANES), 1)
        idx_mat = pi * _X_LANES + xi
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _TOPK_LANES), 1)
        # constants for the stacked-neighbor extraction (see peak loop)
        pcol = jax.lax.broadcasted_iota(jnp.int32, (_P_LANES, 8 * _X_LANES), 0)
        lrow = jax.lax.broadcasted_iota(jnp.int32, (1, 8 * _X_LANES), 1)
        lrow_x = lrow % _X_LANES
        g_l = jax.lax.broadcasted_iota(jnp.int32, (8 * _X_LANES, _TOPK_LANES), 0)
        g_j = jax.lax.broadcasted_iota(jnp.int32, (8 * _X_LANES, _TOPK_LANES), 1)
        gather_g = (g_l // _X_LANES == g_j).astype(jnp.float32)
        neg = jnp.float32(-jnp.inf)
        hbs, pks, stackeds = [], [], []
        for c in range(bc):
            raw = _splat_one(
                cz_ref[c : c + 1, :], cy_ref[c : c + 1, :], w_ref[c : c + 1, :],
                cx_ref[c : c + 1, :], zb, yb, sub_x,
            )
            hbx = jax.lax.dot_general(
                raw, bx_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            hb = jax.lax.dot_general(
                wt_ref[:], hbx, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # strict 26-neighbor peak mask (same rolls as _hist_peaks_kernel)
            xm = pltpu.roll(hb, _X_LANES - 1, 1)
            xp = pltpu.roll(hb, 1, 1)
            mx3 = jnp.maximum(hb, jnp.maximum(xm, xp))
            m = jnp.maximum(xm, xp)
            for dzy in (-12, -11, -10, -1, 1, 10, 11, 12):
                m = jnp.maximum(m, pltpu.roll(mx3, (-dzy) % _P_LANES, 0))
            hbs.append(hb)
            pks.append(jnp.where((hb > m) & interior, hb, neg))
            # one [128, 8*16] neighborhood stack per row, built ONCE and
            # reused by every peak step: lane group j holds hb shifted so
            # position (p, j*16 + x) = the j-th output lane's value at
            # flat index p*16+x — (self, x-1, x+1, y-1, y+1, z-1, z+1,
            # flat index). Rolls wrap, but valid peaks are interior, so
            # their six +-1 neighbors never cross an edge (the wrap only
            # feeds the masked-invalid sel = 0 case).
            stackeds.append(
                jnp.concatenate(
                    [
                        hb,
                        pltpu.roll(hb, 1, 1),               # x - 1
                        pltpu.roll(hb, _X_LANES - 1, 1),    # x + 1
                        pltpu.roll(hb, 1, 0),               # y - 1 (p - 1)
                        pltpu.roll(hb, _P_LANES - 1, 0),    # y + 1
                        pltpu.roll(hb, PATCH_DIM, 0),       # z - 1 (p - 11)
                        pltpu.roll(hb, _P_LANES - PATCH_DIM, 0),  # z + 1
                        idx_mat.astype(jnp.float32),
                    ],
                    axis=1,
                )
            )
        # peak loop OUTER, rows inner: each peak step is a serial chain
        # (max -> first-index min -> extraction -> mask), but the bc rows
        # are independent, so interleaving them gives the in-order VPU bc
        # independent chains to overlap (measured ~3x faster than
        # rows-outer at pipeline row counts). Per peak the extraction is
        # ONE sublane-collapse of the precomputed neighborhood stack plus
        # one [1, 128] x [128, 16] group-gather matmul — replacing the
        # former seven independent full-array masked-sum reduces, which
        # made each chain ~9 serial reduces long (round-4 phase-2b lever).
        rows = [[] for _ in range(bc)]
        for _ in range(k):
            for c in range(bc):
                pk = pks[c]
                mval = jnp.max(pk)
                # first (lowest flat index) slot holding the max: the tie
                # order lax.top_k produces (-inf == -inf, so an empty peak
                # set selects slot 0 with value -inf — masked downstream)
                sel = jnp.min(jnp.where(pk == mval, idx_mat, _BIG_IDX))
                sel_p = sel // _X_LANES
                sel_x = sel % _X_LANES
                # extract row sel_p of the stack (exact: 0/1 mask + add
                # reduce), keep only lanes whose x-position is sel_x, then
                # collapse each 16-lane group to its output lane with a
                # 0/1 gather matmul (products are v*1 or v*0 — exact)
                t = jnp.sum(
                    jnp.where(pcol == sel_p, stackeds[c], 0.0), axis=0,
                    keepdims=True,
                )
                masked = jnp.where(lrow_x == sel_x, t, 0.0)
                # HIGHEST is load-bearing: the default single-pass bf16
                # matmul rounds v*1.0 to 8 mantissa bits (measured 2e-3
                # neighbor error AND corrupted flat indices > 256 —
                # bf16(1318) = 1320); the f32 3-pass decomposition
                # reconstructs v*1.0 exactly, keeping this extraction
                # bit-identical to the masked-sum formulation it replaced
                row = jax.lax.dot_general(
                    masked, gather_g, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                # lane 0 must be the reduce's mval (-inf when no peak is
                # left; the stack extraction would report a finite hb[0])
                row = jnp.where(lane == 0, mval, row)
                rows[c].append(row)
                pks[c] = jnp.where(idx_mat == sel, neg, pk)
        for c in range(bc):
            out_ref[c] = jnp.concatenate(rows[c], axis=0)


@functools.partial(jax.jit, static_argnames=("blur_taps", "k", "interpret"))
def smooth_histogram_topk(cx, cy, cz, weights, blur_taps, k: int,
                          count=None, interpret: bool = False):
    """Top-k blurred-histogram peaks with their subvoxel-interp neighbors.

    cx/cy/cz: [C, V] continuous splat coordinates; weights [C, V];
    blur_taps: hashable tuple of 1D Gaussian taps; count: optional live
    row count — rows >= count (a PREFIX of dead rows at the tail is NOT
    required; only rows < count produce defined output) are skipped.

    Returns [C, k, 16] f32: lane 0 peak value (-inf = no peak), lanes
    1..6 the (x-,x+,y-,y+,z-,z+) blurred-histogram neighbors, lane 7 the
    flat p*16+x peak position. Values are bit-identical to
    smooth_histogram_peaks + lax.top_k + one-hot extraction.
    """
    c = cx.shape[0]
    bc = 8
    (cz_p, cy_p, w_p, cx_p), cp, vp = _pad_inputs(cx, cy, cz, weights, bc)
    b = blur_band_matrix(blur_taps)
    wt = np.zeros((_P_LANES, _P_LANES), np.float32)
    wt[:121, :121] = np.kron(b, b).T
    bx = np.zeros((_X_LANES, _X_LANES), np.float32)
    bx[:PATCH_DIM, :PATCH_DIM] = b
    cnt = (
        jnp.full((1,), c, jnp.int32)
        if count is None
        else jnp.asarray(count, jnp.int32).reshape(1)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cp // bc,),
        in_specs=[
            pl.BlockSpec((bc, vp), lambda i, c_: (i, 0)),
            pl.BlockSpec((bc, vp), lambda i, c_: (i, 0)),
            pl.BlockSpec((bc, vp), lambda i, c_: (i, 0)),
            pl.BlockSpec((bc, vp), lambda i, c_: (i, 0)),
            pl.BlockSpec((_P_LANES, _P_LANES), lambda i, c_: (0, 0)),
            pl.BlockSpec((_X_LANES, _X_LANES), lambda i, c_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bc, k, _TOPK_LANES), lambda i, c_: (i, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_hist_topk_kernel, k=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cp, k, _TOPK_LANES), jnp.float32),
        interpret=interpret,
    )(cnt, cz_p, cy_p, w_p, cx_p, jnp.asarray(wt), jnp.asarray(bx))
    return out[:c]


@functools.partial(jax.jit, static_argnames=("blur_taps", "interpret"))
def smooth_histogram_peaks(cx, cy, cz, weights, blur_taps, interpret: bool = False):
    """Fused splat + blur + strict-peak mask in the [128(p), 16(x)] layout.

    blur_taps: hashable tuple of 1D Gaussian taps. Returns
      hb [C, 128, 16]: blurred histogram, p = z*11 + y on sublanes
      pk [C, 128, 16]: hb where strict interior 26-neighbor peak, -inf else
    Use features._top_peaks_pf / _interp_hist_peaks_pf to consume them.
    """
    c = cx.shape[0]
    bc = 8
    (cz_p, cy_p, w_p, cx_p), cp, vp = _pad_inputs(cx, cy, cz, weights, bc)
    b = blur_band_matrix(blur_taps)
    wt = np.zeros((_P_LANES, _P_LANES), np.float32)
    # W[p, q] = b[z(p), z(q)] * b[y(p), y(q)] = kron(b, b); kernel wants W^T
    wt[:121, :121] = np.kron(b, b).T
    bx = np.zeros((_X_LANES, _X_LANES), np.float32)
    bx[:PATCH_DIM, :PATCH_DIM] = b

    hb, pk = pl.pallas_call(
        _hist_peaks_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((cp, _P_LANES, _X_LANES), jnp.float32),
            jax.ShapeDtypeStruct((cp, _P_LANES, _X_LANES), jnp.float32),
        ),
        grid=(cp // bc,),
        in_specs=[
            pl.BlockSpec((bc, vp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, vp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, vp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, vp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (_P_LANES, _P_LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_X_LANES, _X_LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (bc, _P_LANES, _X_LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bc, _P_LANES, _X_LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(cz_p, cy_p, w_p, cx_p, jnp.asarray(wt), jnp.asarray(bx))
    return hb[:c], pk[:c]


def smooth_histogram_pallas(cx, cy, cz, weights, blur_taps, interpret: bool = False):
    """splat_histogram_raw + separable zero-border blur (banded matmuls
    on the tiny [C, 1331] result). Matches features._smooth_histogram_axes
    up to fp reduction order."""
    raw = splat_histogram_raw(cx, cy, cz, weights, interpret=interpret)
    b = jnp.asarray(blur_band_matrix(blur_taps))
    h = jnp.einsum("czyx,zu->cuyx", raw, b)
    h = jnp.einsum("czyx,yu->czux", h, b)
    return jnp.einsum("czyx,xu->czyu", h, b)
