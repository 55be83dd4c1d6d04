"""Spatially-partitioned extraction for volumes too large for one chip.

The reference caps volume size at single-GPU memory (5 full-resolution
volumes resident, MultiScale.cpp:271-282). Here an oversized volume is
sharded along Z over the mesh's "space" axis and the ENTIRE pipeline runs
sharded, end to end:

- every blur z-pass halo-exchanges filter-radius planes over ICI
  (sift3d.dist.halo.blur3d_sharded, ppermute);
- DoG is elementwise (no communication);
- the extrema stencil runs under shard_map with a one-plane halo
  exchange per DoG level;
- candidate compaction runs per shard (the same hierarchical
  group-nonzero as the single-device pipeline);
- the ragged feature stage (refine / eig / canonical orientations /
  descriptors) runs under shard_map: each shard halo-extends its local
  Gaussian slab by the rotated-patch sampling radius, so every patch
  gather is LOCAL — no cross-shard gathers, only ppermute halo traffic;
- octave bases halve every octave, so once a base fits one chip the
  remaining octaves run the standard single-device pipeline
  (extract_features_many with pre_blurred=True).

Arbitrary Z is supported by zero-padding to a shardable multiple: the
blur's zero-border semantics make padding exact, provided padded rows are
re-zeroed after every blur and the extrema/border masking uses the TRUE
depth (true_z below); the sampling halo replicates the global edge planes
so out-of-volume reads saturate exactly like the single-device
interpolators (kernels/resample.py:_interp_coord).

Equivalence with the single-device pipeline is tested on the simulated
CPU mesh (tests/test_spatial_extract.py).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sift3d.core.config import DEFAULT_CONFIG, SiftConfig
from sift3d.core.featureset import FeatureSet
from sift3d.dist.halo import _exchange_halo_z, blur3d_sharded, shard_volume
from sift3d.kernels.extrema import extrema_mask
from sift3d.kernels.resample import subsample_2x
from sift3d.pipeline import features as fstage
from sift3d.pipeline import pyramid


def _zero_tail(vol, mesh: Mesh, true_z: int, axis_name: str = "space"):
    """Zero all planes with global z >= true_z (the Z-padding region)."""
    if true_z >= vol.shape[0]:
        return vol
    spec = P(axis_name, None, None)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False
    )
    def _z(local):
        tz = local.shape[0]
        z0 = jax.lax.axis_index(axis_name) * tz
        zg = jnp.arange(tz) + z0
        return jnp.where((zg < true_z)[:, None, None], local, 0.0)

    return _z(vol)


def _extrema_sharded(dogs, mesh: Mesh, axis_name: str = "space",
                     true_z: Optional[int] = None):
    """Strict 80-comparison extrema over a Z-sharded [5, Z, Y, X] stack.

    true_z: the TRUE volume depth when Z is padded — border masking
    follows the true depth (rows 0 and true_z-1 plus all padding rows are
    zeroed, matching the single-device interior-only scan).
    """
    spec = P(None, axis_name, None, None)
    zd = dogs.shape[1]
    tzz = zd if true_z is None else true_z

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False)
    def _mask(local):
        # attach one halo plane per side on every level, run the local
        # stencil, then crop; the halo rows extrema_mask zeroed are the
        # crop, so rows adjacent to shard boundaries carry correct values
        idx = jax.lax.axis_index(axis_name)
        ext = jnp.stack([_exchange_halo_z(local[l], 1, axis_name) for l in range(local.shape[0])])
        m = extrema_mask(ext)  # [3, tz+2, Y, X], slab borders already zeroed
        m = m[:, 1:-1]
        # re-apply the GLOBAL z border rule: the single-device scan is
        # interior-only in the true volume, so rows 0 and true_z-1 (and
        # every padded row beyond) must be zero
        tz = m.shape[1]
        zg = jnp.arange(tz)[None, :, None, None] + idx * tz
        border = (zg == 0) | (zg >= tzz - 1)
        return jnp.where(border, jnp.int8(0), m)

    return _mask(dogs)


class ShardedOctave(NamedTuple):
    gstack: jnp.ndarray  # [6, Z, Y, X] Z-sharded
    dogs: jnp.ndarray  # [5, Z, Y, X] Z-sharded
    mask: jnp.ndarray  # [3, Z, Y, X] Z-sharded int8
    next_base: jnp.ndarray  # [Z/2, Y, X] Z-sharded


def octave_step_spatial(base, cfg: SiftConfig, mesh: Mesh, axis_name: str = "space",
                        true_z: Optional[int] = None):
    """One pyramid octave over a Z-sharded volume.

    true_z: TRUE depth when the volume is zero-padded along Z; every blur
    output is re-zeroed beyond it (the blur leaks into the padding, but
    the single-device volume simply ends there — zero-border semantics).
    """
    zp = base.shape[0]
    tzz = zp if true_z is None else true_z
    inc = cfg.incremental_sigmas()
    levels = [base]
    for j in range(1, cfg.blurs_total):
        lv = blur3d_sharded(levels[-1], inc[j - 1], mesh, cfg.blur_precision,
                            axis_name, cfg.blur_matmul_precision)
        if tzz < zp:
            lv = _zero_tail(lv, mesh, tzz, axis_name)
        levels.append(lv)
    gstack = jnp.stack(levels)
    dogs = gstack[:-1] - gstack[1:]
    mask = _extrema_sharded(dogs, mesh, axis_name, true_z=tzz)

    spec_in = P(axis_name, None, None)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=spec_in, out_specs=spec_in, check_vma=False
    )
    def _sub(local):
        return subsample_2x(local)

    next_base = _sub(levels[cfg.blurs_per_octave])
    if tzz < zp:
        next_base = _zero_tail(next_base, mesh, tzz // 2, axis_name)
    return ShardedOctave(gstack, dogs, mask, next_base)


def initial_blur_spatial(vol, cfg: SiftConfig, mesh: Mesh, initial_image_scale: float = 1.0,
                         axis_name: str = "space", true_z: Optional[int] = None):
    sigma_init = cfg.sigma_init
    if initial_image_scale > 0:
        sigma_init = sigma_init / initial_image_scale
    extra = math.sqrt(max(cfg.sigma_base**2 - sigma_init**2, 0.0))
    out = blur3d_sharded(vol, extra, mesh, cfg.blur_precision, axis_name,
                         cfg.blur_matmul_precision)
    if true_z is not None and true_z < vol.shape[0]:
        out = _zero_tail(out, mesh, true_z, axis_name)
    return out


# ---------------------------------------------------------------------------
# End-to-end sharded extraction
# ---------------------------------------------------------------------------


def _sampling_halo(cfg: SiftConfig) -> int:
    """Halo planes covering every patch read a shard's candidates can make.

    Rotated 11^3 patch points reach 2*sqrt(3)*scale from the feature
    center (kernels/patch.py:rbox_max_scale); the refined center sits
    within 1.5 voxels of the candidate row, and the 2-tap interpolation
    reads one plane further. scale < 2*sigma[lvl+1] <= 2*sigmas[-2]
    because the quadratic scale vertex of a strict extremum stays inside
    its bracketing level sigmas (MultiScale.cpp:1376-1381).
    """
    max_scale = 2.0 * cfg.level_sigmas()[-2]
    return int(math.ceil(2.0 * math.sqrt(3.0) * max_scale + 3.0))


def _sampling_slab(level, halo: int, z0, true_z: int, axis_name: str):
    """Halo-extend one [tz, Y, X] Gaussian level for patch sampling.

    Beyond the true volume the slab replicates the global edge planes,
    because the single-device samplers SATURATE out-of-range z reads onto
    the border plane (_interp_coord clamp / _taps_transposed): a read past
    the end must see plane true_z-1, not the zero padding.
    """
    ext = _exchange_halo_z(level, halo, axis_name)
    zl = ext.shape[0]
    zg = jnp.arange(zl) + z0 - halo
    # local index of global plane 0 / true_z-1 (only meaningful on shards
    # whose slab contains them; elsewhere the jnp.where never selects it)
    lo_plane = ext[jnp.clip(halo - z0, 0, zl - 1)]
    hi_plane = ext[jnp.clip(true_z - 1 - z0 + halo, 0, zl - 1)]
    out = jnp.where((zg < 0)[:, None, None], lo_plane[None], ext)
    return jnp.where((zg >= true_z)[:, None, None], hi_plane[None], out)


def _compact_sharded(mask, mesh: Mesh, size: int, axis_name: str):
    """Per-shard hierarchical candidate compaction (extract._compact_mask_one
    under shard_map). Returns stacked (gidx [n, size], blocks [n, size, 64],
    group_count [n], cand_count [n])."""
    from sift3d.pipeline.extract import _compact_mask_one

    in_spec = P(None, axis_name, None, None)
    out_specs = (
        P(axis_name, None),
        P(axis_name, None, None),
        P(axis_name),
        P(axis_name),
    )

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_spec, out_specs=out_specs, check_vma=False
    )
    def _c(local):
        gidx, blocks, gc, cc = _compact_mask_one(local, size)
        return gidx[None], blocks[None], gc[None], cc[None]

    return _c(mask)


def _feature_phase_a(gstack, dogs, cand_sh, mesh: Mesh, cfg: SiftConfig, sigmas,
                     tz: int, true_z: int, halo: int, descriptor: str,
                     reoriented: bool, axis_name: str):
    """Sharded gather/eig/canonical/pack/descriptor front half.

    Each shard runs the standard stage functions on its halo-extended
    local slab and its own candidate table — the analogue of
    extract._phase2a_program + _phase2b_program, with zero cross-shard
    gathers. Returns per-shard stacked outputs (leading mesh axis)."""
    spec_v = P(None, axis_name, None, None)
    spec_c = P(axis_name, None, None)

    def sp(nd):
        return P(axis_name, *([None] * (nd - 1)))

    out_specs = dict(
        packed_un=sp(3), desc_un=sp(3), xyz=sp(3), scale=sp(2), keep=sp(2),
        eigs=sp(3), ori=sp(6), ori_valid=sp(4), counts=sp(2),
    )

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec_v, spec_v, spec_c),
        out_specs=out_specs, check_vma=False,
    )
    def _run(g_loc, d_loc, cand_loc):
        cand = cand_loc[0]
        z0 = jax.lax.axis_index(axis_name) * tz
        ext_g = jnp.stack(
            [_sampling_slab(g_loc[l], halo, z0, true_z, axis_name)
             for l in range(g_loc.shape[0])]
        )
        ext_d = jnp.stack(
            [_exchange_halo_z(d_loc[l], 1, axis_name) for l in range(d_loc.shape[0])]
        )
        # candidate z is dogs-local (global z - z0 + 1); the iRadMax test
        # runs against the TRUE global z range expressed in local coords
        z_bounds = (
            jnp.asarray(1 - z0, jnp.float32),
            jnp.asarray(true_z + 1 - z0, jnp.float32),
        )
        xyz, scale, pn, eigs, eig_ori, keep_rows, _ = fstage.gather_eig_stage(
            ext_g[None], ext_d[None], cand, sigmas, cfg,
            z_bounds=z_bounds, gz_shift=halo - 1,
        )
        o = fstage.canonical_stage(pn, cfg)
        counts = fstage.emit_count_stage(
            keep_rows, o["ori_valid"], scale, cfg, reoriented
        )
        packed_un = fstage.pack_unoriented_stage(
            keep_rows, cand, xyz, scale, eigs, eig_ori, cfg
        )
        desc_un = fstage.descriptor_stage(pn, descriptor).astype(jnp.uint8)
        return dict(
            packed_un=packed_un[None], desc_un=desc_un[None], xyz=xyz[None],
            scale=scale[None], keep=keep_rows[None], eigs=eigs[None],
            ori=o["ori"][None], ori_valid=o["ori_valid"][None], counts=counts[None],
        )

    return _run(gstack, dogs, cand_sh)


def _feature_phase_b(gstack, cand_sh, a, mesh: Mesh, cfg: SiftConfig, cap_r: int,
                     tz: int, true_z: int, halo: int, descriptor: str,
                     axis_name: str):
    """Sharded reoriented emission (extract._phase2c_program analogue)."""
    spec_v = P(None, axis_name, None, None)

    def sp(nd):
        return P(axis_name, *([None] * (nd - 1)))

    in_specs = (spec_v, sp(3), sp(3), sp(2), sp(2), sp(3), sp(6), sp(4))
    out_specs = (sp(1), sp(3), sp(3))

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    def _run(g_loc, cand_loc, xyz_l, scale_l, keep_l, eigs_l, ori_l, ov_l):
        z0 = jax.lax.axis_index(axis_name) * tz
        ext_g = jnp.stack(
            [_sampling_slab(g_loc[l], halo, z0, true_z, axis_name)
             for l in range(g_loc.shape[0])]
        )
        count, packed_re, patches = fstage.emit_reoriented_stage(
            ext_g[None], cand_loc[0], xyz_l[0], scale_l[0], keep_l[0], eigs_l[0],
            ori_l[0], ov_l[0], cfg, cap_r, "all", gz_shift=halo - 1,
        )
        desc_re = fstage.descriptor_stage(patches, descriptor).astype(jnp.uint8)
        return count[None], packed_re[None], desc_re[None]

    return _run(
        gstack, cand_sh, a["xyz"], a["scale"], a["keep"], a["eigs"], a["ori"],
        a["ori_valid"],
    )


def _extract_octave_spatial(oct_res: ShardedOctave, mesh: Mesh, cfg: SiftConfig,
                            sigmas, true_z: int, halo: int, descriptor: str,
                            reoriented: bool, axis_name: str) -> FeatureSet:
    """Features of one Z-sharded octave, in octave-local coordinates."""
    from sift3d.pipeline.extract import _bucket, _decode_candidates_np

    n = mesh.shape[axis_name]
    _, zp, yd, xd = oct_res.mask.shape
    tz = zp // n
    size = min(8 * cfg.max_candidates_per_level, 3 * tz * yd)  # X-row groups

    gidx, blocks, gc, _ = _compact_sharded(oct_res.mask, mesh, size, axis_name)
    gidx_h, blocks_h, gc_h = jax.device_get([gidx, blocks, gc])

    lvls, zs, ys, xs, sgs = [], [], [], [], []
    for s in range(n):
        lv, z, y, x, sg = _decode_candidates_np(
            (3, tz, yd, xd), gidx_h[s], blocks_h[s], int(gc_h[s]), size,
            lambda s=s: oct_res.mask[:, s * tz : (s + 1) * tz],
        )
        if lv.size == 0:
            continue
        lvls.append(lv)
        zs.append(z + s * tz)  # global z
        ys.append(y)
        xs.append(x)
        sgs.append(sg)
    if not lvls:
        return FeatureSet.empty(0)
    lv = np.concatenate(lvls).astype(np.int64)
    zg = np.concatenate(zs).astype(np.int64)
    yy = np.concatenate(ys).astype(np.int64)
    xx = np.concatenate(xs).astype(np.int64)
    sg = np.concatenate(sgs).astype(np.int32)

    # reference emission order (extract.py phase 2): per DoG level, valleys
    # then peaks, scan order over (z, y, x)
    order = np.lexsort((xx, yy, zg, sg > 0, lv))
    lv, zg, yy, xx, sg = lv[order], zg[order], yy[order], xx[order], sg[order]
    n_cand = lv.shape[0]
    grank_all = np.arange(n_cand, dtype=np.int64)
    shard = zg // tz

    per_shard = [np.nonzero(shard == s)[0] for s in range(n)]
    cap = _bucket(max((len(i) for i in per_shard), default=1), size * xd)
    cand_np = np.zeros((n, cap, 6), np.int32)
    cand_np[:, :, 1:5] = 1  # padding rows: in-range coords, sign == 0
    grank = np.full((n, cap), -1, np.int64)
    for s, ids in enumerate(per_shard):
        k = len(ids)
        if k == 0:
            continue
        cand_np[s, :k, 0] = 0  # vi: single volume per slab stack
        cand_np[s, :k, 1] = lv[ids] + 1  # center DoG index 1..3
        cand_np[s, :k, 2] = zg[ids] - s * tz + 1  # dogs-local z (halo 1)
        cand_np[s, :k, 3] = yy[ids]
        cand_np[s, :k, 4] = xx[ids]
        cand_np[s, :k, 5] = sg[ids]
        grank[s, :k] = grank_all[ids]

    cand_sh = jax.device_put(
        cand_np, NamedSharding(mesh, P(axis_name, None, None))
    )

    a = _feature_phase_a(
        oct_res.gstack, oct_res.dogs, cand_sh, mesh, cfg, sigmas, tz, true_z,
        halo, descriptor, reoriented, axis_name,
    )
    counts = np.asarray(jax.device_get(a["counts"])).astype(np.int64)  # [n, 4]
    packed_un, desc_un = jax.device_get([a["packed_un"], a["desc_un"]])

    reor = counts[:, 0] - counts[:, 3]
    packed_re = desc_re = None
    s_tot = cfg.max_primary_orientations * cfg.max_secondary_orientations
    if reoriented and int(reor.max()) > 0:
        # hard bound: min(K1*K2, max_orientations) rows per candidate, so
        # the exact-count bucket can never truncate; the rotated samplers
        # row-chunk at 256 (patch.py rc), so round the bound up to a 256
        # multiple exactly as extract.py does for its cap_limit
        bound = cap * max(1, min(s_tot, cfg.max_orientations))
        cap_r = _bucket(int(reor.max()), -(-bound // 256) * 256)
        cnt_re, packed_re, desc_re = jax.device_get(
            _feature_phase_b(
                oct_res.gstack, cand_sh, a, mesh, cfg, cap_r, tz, true_z, halo,
                descriptor, axis_name,
            )
        )
        assert int(np.asarray(cnt_re).max()) <= cap_r

    # host merge: per-shard local order keys -> global reference order
    bufs, dscs, keys = [], [], []
    for s in range(n):
        parts = [(packed_un[s], desc_un[s])]
        if packed_re is not None:
            parts.append((packed_re[s], desc_re[s]))
        for buf, dsc in parts:
            buf = np.asarray(buf)
            m = buf[:, 17] >= 0
            if not m.any():
                continue
            buf, dsc = buf[m].copy(), np.asarray(dsc)[m]
            k = buf[:, 17].astype(np.int64)
            lr, slot = np.divmod(k, 1 + s_tot)
            keys.append(grank[s][lr] * (1 + s_tot) + slot)
            buf[:, 2] += s * tz - 1  # dogs-local z -> global z
            bufs.append(buf)
            dscs.append(dsc)
    if not bufs:
        return FeatureSet.empty(0)
    buf = np.concatenate(bufs)
    dsc = np.concatenate(dscs)
    order = np.argsort(np.concatenate(keys), kind="stable")
    buf, dsc = buf[order], dsc[order]
    return FeatureSet(
        xyz=buf[:, 0:3],
        scale=buf[:, 3],
        eigs=buf[:, 4:7],
        ori=buf[:, 7:16].reshape(-1, 3, 3),
        info=buf[:, 16].astype(np.uint32),
        desc=dsc.astype(np.float32),
    )


def _scaled(f: FeatureSet, factor: float) -> FeatureSet:
    """Octave geometry scaling (MultiScale.cpp:531-543)."""
    return FeatureSet(
        xyz=f.xyz * np.float32(factor), scale=f.scale * np.float32(factor),
        eigs=f.eigs, ori=f.ori, info=f.info, desc=f.desc,
    )


def extract_features_spatial(
    vol,
    mesh: Mesh,
    cfg: SiftConfig = DEFAULT_CONFIG,
    initial_image_scale: float = 1.0,
    descriptor: str = "goh",
    reoriented: bool = True,
    sharded_octaves: Optional[int] = None,
    axis_name: str = "space",
) -> FeatureSet:
    """End-to-end feature extraction from a Z-sharded oversized volume.

    The first `sharded_octaves` octaves run fully sharded over the mesh's
    `axis_name` axis (dense pyramid via halo-exchange, ragged feature
    stage via halo-extended local slabs); the remaining octaves — whose
    bases have halved `sharded_octaves` times — run on a single device
    through the standard pipeline. Output equals extract_features on the
    gathered volume (tests/test_spatial_extract.py).

    sharded_octaves=None picks the octaves whose resident working set
    (11 float volumes: 6 Gaussian + 5 DoG levels) exceeds ~2 GiB.
    """
    from sift3d.pipeline.extract import extract_features, extract_features_many

    vol = np.asarray(vol, np.float32)
    zg, yd, xd = vol.shape
    n = mesh.shape[axis_name]
    n_oct = pyramid.num_octaves(vol.shape, cfg)
    if sharded_octaves is None:
        k_shard, v = 0, zg * yd * xd
        while k_shard < n_oct and v * 11 * 4 > 2 * 1024**3:
            k_shard += 1
            v //= 8
    else:
        k_shard = max(0, min(int(sharded_octaves), n_oct))
    if k_shard == 0 or n == 1:
        return extract_features(
            vol, cfg, initial_image_scale=initial_image_scale,
            descriptor=descriptor, reoriented=reoriented,
        )

    # pad Z so every sharded octave shards AND subsamples evenly
    mult = n * (2**k_shard)
    zp = -(-zg // mult) * mult
    if zp > zg:
        vol = np.concatenate([vol, np.zeros((zp - zg, yd, xd), np.float32)])

    halo = _sampling_halo(cfg)
    sigmas = tuple(cfg.level_sigmas())

    base = shard_volume(jnp.asarray(vol), mesh, axis_name)
    base = initial_blur_spatial(
        base, cfg, mesh, initial_image_scale, axis_name, true_z=zg
    )
    true_z = zg
    sets = []
    for k in range(k_shard):
        oct_res = octave_step_spatial(base, cfg, mesh, axis_name, true_z=true_z)
        feats = _extract_octave_spatial(
            oct_res, mesh, cfg, sigmas, true_z, halo, descriptor, reoriented,
            axis_name,
        )
        if len(feats):
            sets.append(_scaled(feats, 2.0**k))
        base = oct_res.next_base
        true_z //= 2
        del oct_res

    if k_shard < n_oct:
        base_host = np.asarray(jax.device_get(base))[:true_z]
        tail = extract_features_many(
            [base_host], cfg, descriptor=descriptor, reoriented=reoriented,
            pre_blurred=True,
        )[0]
        if len(tail):
            sets.append(_scaled(tail, 2.0**k_shard))
    return FeatureSet.concatenate(sets)
