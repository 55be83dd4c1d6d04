"""End-to-end feature extraction: the featExtract pipeline re-orchestrated.

Host-side octave loop driving the jitted device programs:

  initial_blur -> per octave: octave_step (blurs + DoGs + fused extrema)
               -> candidate extraction from the mask (tiny int8 transfer)
               -> gather_stage (refine + bounds + identity patches)
               -> orient_stage (eigen + canonical orientations)
               -> resample_stage (rotated patches)
               -> descriptor_stage (GoH/BRIEF + rank)

Feature geometry follows MultiScale.cpp:531-543: octave-local coordinates
(already +0.5 shifted) are scaled by 2^octave, as is the interpolated
scale (itself 2x the interpolated sigma).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from sift3d.core.config import DEFAULT_CONFIG, SiftConfig
from sift3d.core.featureset import FeatureSet
from sift3d.pipeline import features as fstage
from sift3d.pipeline.features import scatter_compact as _scatter_compact
from sift3d.pipeline import pyramid
from sift3d.utils.timing import StageTimer


# test hook: route candidate-table building through the legacy host
# decode path (the overflow fallback) to assert both paths agree
_FORCE_LEGACY_CANDIDATES = False

# opt-in slab-layout pre-padding (measured negative on the relay v5e,
# kept for other hardware — PERFORMANCE.md round 3). Snapshotted ONCE at
# import: the gate is baked into _phase1_program's jit cache, so a
# mid-process env toggle would desynchronize cached vs fresh traces
# (same class of trap as features._TINY_BUCKET_ENABLED, ADVICE r3).
import os as _os_mod

_PREPAD = bool(_os_mod.environ.get("SIFT3D_PREPAD"))
# bf16 Gaussian-stack storage: the slab samplers' per-row DMA (their
# dominant cost: [box, box+apron, Xp] per feature row) moves half the
# bytes, and in streams mode the halved HBM footprint relieves
# bandwidth contention between overlapped streams (paired ABBA: ~+6%
# end-to-end at 12/3 even though forced-sync phase times barely move —
# BF16AB_r05.json). Modes:
#   SIFT3D_BF16_GSTACK=2c  (split): phase 1 emits a bf16 COPY that only
#       the phase-2c rotated/descriptor samplers read; 2a/2b identity
#       patches keep their exact-f32 source. The rotated kernels round
#       their box to bf16 in-kernel anyway, so 2c output is BIT-
#       IDENTICAL and keypoints/orientations stay parity-exact. The f32
#       stack is dropped right after 2a dispatch, so 2b/2c-phase HBM
#       residency actually shrinks vs f32-only.
#   SIFT3D_BF16_GSTACK=1   (full): the stack itself is stored bf16;
#       fastest, but identity patches (2a eig + 2b orientation input)
#       become bf16-rounded at source (~2^-9) which can tie-flip
#       borderline keypoints — kept opt-in for that reason.
_BF16_GSTACK = _os_mod.environ.get("SIFT3D_BF16_GSTACK", "")


def _pad_to(arr: np.ndarray, n: int, fill=0):
    if arr.shape[0] == n:
        return arr
    pad = np.full((n - arr.shape[0],) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def _bucket(n: int, cap: int) -> int:
    """Smallest power-of-2 shape bucket >= n (bounded by cap).

    Bucketing bounds the number of distinct compiled shapes while keeping
    padded-capacity waste under 2x.
    """
    b = 64
    while b < n and b < cap:
        b *= 2
    return min(b, cap)


def _bucket_fine(n: int) -> int:
    """Shape bucket with ~1/16 granularity (waste <= ~6%, 16 shapes per
    octave of n). Used for the final download buffer, whose bytes are
    wall-clock through the ~30 MB/s tunnel — pow-2 bucketing there could
    waste almost 2x the transfer."""
    g = max(256, 1 << max(0, n.bit_length() - 5))
    return max(256, (n + g - 1) // g * g)


def _compact_mask_one(mask: jnp.ndarray, size: int):
    """Device-side extrema compaction: nonzero X-ROWS + their mask bytes.

    A flat nonzero over the whole mask costs ~200 ms at T1 scale (the
    cumsum-based lowering touches every element many times), and any
    64-element regrouping of the flattened mask forces an int8 relayout
    that costs ~60 ms alone. Masks are extremely sparse, so compact in
    the mask's NATIVE layout: group = one X-row, the any() reduction runs
    along the minor dimension (free), scatter-compact the [3*Z*Y] row
    flags, then gather the hit rows' bytes (contiguous minor-dim rows —
    the gather TPUs like). The host decodes element indices from
    (row index, offset). Whole compaction: <10 ms at batch-12 T1 scale
    vs ~110 ms for the former 64-group reshape formulation.

    Returns (row_idx [size], row_blocks [size, X] int8, row_count,
    candidate_count).
    """
    xd = mask.shape[-1]
    rows = mask.reshape(-1, xd)
    nz = rows != 0
    hit = nz.any(axis=1)
    group_count = hit.sum()
    cand_count = nz.sum()
    gidx = _scatter_compact(hit, size)
    blocks = rows[jnp.clip(gidx, 0)]
    blocks = jnp.where((gidx >= 0)[:, None], blocks, 0)
    return gidx, blocks, group_count, cand_count


@functools.partial(jax.jit, static_argnames=("size",))
def _compact_mask(mask: jnp.ndarray, size: int):
    """Batched hierarchical compaction over [B, ...] masks (one program
    per octave shape serves the whole volume batch)."""
    return jax.vmap(lambda m: _compact_mask_one(m, size))(mask)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_oct", "sizes", "initial_image_scale", "pre_blurred"),
)
def _phase1_program(stack, cfg, n_oct: int, sizes, initial_image_scale: float,
                    pre_blurred: bool = False):
    """The ENTIRE dense phase as one compiled program: initial blur, every
    octave's blur chain + DoGs + extrema stencil, and the hierarchical
    candidate compaction of every octave's mask.

    One dispatch replaces the former 1 + 2*n_oct (initial blur + per-octave
    step/compact): on the tunnel runtime each host call costs ~30 ms, which
    at six octaves was ~40% of steady-state batch time. All octave shapes
    are static, so XLA sees one straight-line graph.

    Returns a list of per-octave dicts; counts is [n_oct, B] so ONE small
    sync serves every bucket decision.
    """
    # pre_blurred: the stack is already at sigma_base (an octave base from
    # the spatially-sharded front of the pipeline) — skip the initial blur
    base = stack if pre_blurred else pyramid.initial_blur_core(
        stack, cfg, initial_image_scale
    )
    outs = []
    counts = []
    for octave in range(n_oct):
        gstack, dogs, mask, next_base = pyramid.octave_core(base, cfg)
        gstack16 = None
        if jax.default_backend() == "tpu" and _BF16_GSTACK and not _PREPAD:
            if _BF16_GSTACK == "2c":
                gstack16 = gstack.astype(jnp.bfloat16)
            else:
                gstack = gstack.astype(jnp.bfloat16)
        if jax.default_backend() == "tpu" and _PREPAD:
            # OPT-IN (measured NEGATIVE on the relay v5e, kept for other
            # hardware): materialize the stack once in the slab-DMA layout
            # so phases 2a/2c skip their internal pads via logical_dims.
            # Standalone the pads cost ~35 ms each at o0 batch-12, but
            # in-program they are evidently elided/overlapped: A/B showed
            # 2a/2c unchanged and phase1 +31 ms (PERFORMANCE.md round 3).
            from sift3d.kernels.patch import pad_gstack_slab

            gstack = pad_gstack_slab(gstack)
        gidx, blocks, gc, cc = jax.vmap(
            lambda m, s=sizes[octave]: _compact_mask_one(m, s)
        )(mask)
        out = dict(gstack=gstack, dogs=dogs, mask=mask, gidx=gidx, blocks=blocks)
        if gstack16 is not None:
            out["gstack16"] = gstack16
        outs.append(out)
        counts.append(jnp.stack([gc, cc], axis=-1))
        base = next_base
    return outs, jnp.stack(counts)  # [n_oct, B, 2] (group, candidate)


@functools.partial(jax.jit, static_argnames=("caps",))
def _phase15_program(gidxs, blockss, caps):
    """Exact candidate extraction for every (group, octave): a second-level
    nonzero over the already-compacted group bytes, so the host downloads
    [cap] int32 flat indices + [cap] int8 signs instead of the full group
    blocks (~6x fewer D2H bytes through the ~50 MB/s tunnel).

    gidxs/blockss: per-octave [B, size] / [B, size, X] from phase 1.
    caps: static per-octave candidate capacities (bucketed from the synced
    exact counts, so overflow is impossible).
    """
    outs = []
    for gidx, blocks, cap in zip(gidxs, blockss, caps):
        xd = blocks.shape[-1]

        def one(gi, bl, xd=xd):
            flat = bl.reshape(-1)
            nz = _scatter_compact(flat != 0, cap)
            nzc = jnp.clip(nz, 0)
            sign = flat[nzc].astype(jnp.int8)
            idx = gi[nzc // xd] * xd + nzc % xd
            idx = jnp.where(nz >= 0, idx, -1)
            sign = jnp.where(nz >= 0, sign, 0)
            return idx.astype(jnp.int32), sign

        outs.append(jax.vmap(one)(gidx, blocks))
    return outs


@functools.partial(jax.jit, static_argnames=("caps", "out_caps", "dims"))
def _phase15_tables_program(gidxs, blockss, ccounts, caps, out_caps, dims):
    """Device-built candidate tables, replacing the host decode round trip.

    Produces the concatenated [sum(out_caps), 6] int32 candidate table
    (vi, dog level, z, y, x, sign) directly on device, in the exact order
    the host decode used to build it: volume-major, then (dog level,
    valleys-before-peaks, scan order) within each volume — the order that
    reproduces the reference's per-octave emission
    (generateFeatures3D_efficient loops, MultiScale.cpp:425-467). The
    former path downloaded [cap] flat indices + signs, ran ~25 ms of
    numpy divmod/sort/concat per octave, and re-uploaded the table; each
    leg pays the tunnel's ~33 ms RTT floor (~240 ms per batch-12 total).

    gidxs/blockss: per-octave [B, size]/[B, size, X] phase-1 compaction
    outputs (sliced to the group-count bucket). ccounts: per-octave [B]
    DEVICE exact candidate counts (phase 1's counts array — no upload).
    caps: static per-octave extraction capacities (bucketed from the
    synced counts, so >= every volume's count — overflow impossible).
    out_caps: static table sizes = sum of the octave's chunk capacities.
    dims: static (nl, zd, yd, xd) extrema-mask dims per octave.

    Padding rows are (0, 1, 0, 0, 0, 0) — sign 0 marks them invalid, and
    level 1 keeps them inside gather range (same as the host packer).
    """
    outs = []
    for gidx, blocks, cc, cap, out_cap, (nl, zd, yd, xd) in zip(
        gidxs, blockss, ccounts, caps, out_caps, dims
    ):
        def one(gi, bl, cap=cap, nl=nl, zd=zd, yd=yd, xd=xd):
            flat = bl.reshape(-1)
            nz = _scatter_compact(flat != 0, cap)
            nzc = jnp.clip(nz, 0)
            sign = jnp.where(nz >= 0, flat[nzc], 0).astype(jnp.int32)
            idx = gi[nzc // xd] * xd + nzc % xd
            lvl0 = idx // (zd * yd * xd)
            # source rows are flat-index (level, z, y, x) ascending, so a
            # stable sort on (level, peak?) alone reproduces the reference
            # emission order; padding sorts past every valid key
            key = jnp.where(nz >= 0, lvl0 * 2 + (sign > 0), 2 * nl)
            order = jnp.argsort(key, stable=True)
            idx, sign = idx[order], sign[order]
            rem = idx % (zd * yd * xd)
            return jnp.stack(
                [
                    jnp.zeros_like(sign),  # vi, filled below
                    idx // (zd * yd * xd) + 1,
                    rem // (yd * xd),
                    (rem // xd) % yd,
                    rem % xd,
                    sign,
                ],
                axis=1,
            ).astype(jnp.int32)

        rows = jax.vmap(one)(gidx, blocks)  # [B, cap, 6]
        nb = rows.shape[0]
        rows = rows.at[:, :, 0].set(jnp.arange(nb, dtype=jnp.int32)[:, None])
        cc = cc.astype(jnp.int32)
        offs = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(cc)])[:-1]
        ar = jnp.arange(cap, dtype=jnp.int32)
        # the sort puts each volume's cc valid rows first: compact them at
        # the volume's exclusive-cumsum offset, drop everything else
        dest = jnp.where(ar[None, :] < cc[:, None], offs[:, None] + ar[None, :], out_cap)
        out = jnp.zeros((out_cap, 6), jnp.int32).at[:, 1].set(1)
        outs.append(out.at[dest.reshape(-1)].set(rows.reshape(-1, 6), mode="drop"))
    return jnp.concatenate(outs)


@functools.partial(jax.jit, static_argnames=("layout", "sigmas", "cfg"))
def _phase2a_program(stacks, cand_all, layout, sigmas, cfg):
    """Gather + eig for EVERY candidate chunk of every (group, octave) as
    one compiled program fed by one packed upload.

    stacks: tuple of (gstack, dogs) per octave-result (octave shapes
    differ, so they stay separate args). layout: static tuple of
    (res_index, cap) per chunk; caps sum to cand_all.shape[0]. Each
    ~100 KB candidate upload and each dispatch costs a tunnel RTT
    (~30-40 ms); at 6 octaves that was ~0.4 s of pure latency per batch.
    """
    outs = {k: [] for k in ("xyz", "scale", "pn", "eigs", "eig_ori", "keep_rows")}
    off = 0
    for res_i, cap in layout:
        gstack, dogs = stacks[res_i]
        cand = jax.lax.slice_in_dim(cand_all, off, off + cap)
        off += cap
        # kept count (last element) rides along in phase 2b's counts instead
        xyz, scale, pn, eigs, eig_ori, keep_rows, _ = fstage.gather_eig_stage(
            gstack, dogs, cand, sigmas, cfg
        )
        for key, v in zip(
            ("xyz", "scale", "pn", "eigs", "eig_ori", "keep_rows"),
            (xyz, scale, pn, eigs, eig_ori, keep_rows),
        ):
            outs[key].append(v)
    return {k: jnp.concatenate(v) for k, v in outs.items()}


@functools.partial(jax.jit, static_argnames=("layout", "cfg", "reoriented"))
def _phase2b_program(
    keep_all, cand_all, pn_all, eigs_all, eig_ori_all, xyz_all, scale_all,
    layout, cfg, reoriented: bool,
):
    """Canonical orientations + emit counts for all chunks in one program.

    layout: static (offset, cap) per chunk. Runs directly on the phase-2a
    rows at chunk capacity — no survivor compaction and therefore NO host
    sync between 2a and 2b: the host dispatches this program immediately
    and the device flows straight from 2a into it. (The former
    select_stage compaction saved little: survivor counts bucket to
    near-capacity anyway, and the kept-count sync it required cost a full
    tunnel round trip plus the 2a drain wait.) Non-survivor rows ride
    along masked by kvalid; their order keys stay candidate-ordered, so
    the host merge is unchanged. Returns the per-chunk
    [total, tiny-box, small-box, kept] counts (the only host read)."""
    keys = ("kvalid", "cand", "pn", "eigs", "eig_ori", "xyz", "scale", "ori", "ori_valid")
    outs = {k: [] for k in keys}
    counts = []
    for off, cap in layout:
        sl = slice(off, off + cap)
        kvalid = keep_all[sl]
        pn_k = pn_all[sl]
        scale_k = scale_all[sl]
        o = fstage.canonical_stage(pn_k, cfg, kvalid)
        counts.append(
            fstage.emit_count_stage(kvalid, o["ori_valid"], scale_k, cfg, reoriented)
        )
        for key, v in zip(
            keys,
            (kvalid, cand_all[sl], pn_k, eigs_all[sl], eig_ori_all[sl],
             xyz_all[sl], scale_k, o["ori"], o["ori_valid"]),
        ):
            outs[key].append(v)
    return {k: jnp.concatenate(v) for k, v in outs.items()}, jnp.stack(counts)


@functools.partial(
    jax.jit,
    static_argnames=("layout", "cfg", "descriptor", "reoriented", "out_cap", "gdims"),
)
def _phase2c_program(
    gstacks, sel, layout, cfg, descriptor: str, reoriented: bool, out_cap: int,
    gdims=None,
):
    """Row packing + descriptors for all chunks in one program: unoriented
    rows reuse the gather-stage patches; reoriented rows resample rotated
    patches, bucketed by scale so small-scale rows use the 48^3 sampler
    box. layout: static (res_index, cap_offset, cap, cap_tiny, cap_small, cap_large)
    per surviving chunk; cap_offset/cap address the chunk's cap-length
    (uncompacted) block in the concatenated phase-2b arrays. Takes only
    the Gaussian stacks (the DoG stacks are dead after phase 2a and
    freeing them is what lets a second in-flight batch fit in HBM).

    Returns ONE compacted [out_cap, 35] f32 download buffer: the 19
    packed-row columns + the 64-byte uint8 descriptor bitcast to 16 f32
    columns. Valid rows (order key >= 0) are compacted to the front in
    block order — exact per-block row counts are host-known from the
    phase-2b counts sync, so the host slices blocks by exact offsets.
    One exact-size transfer replaces two padded ones (each D2H leg pays
    a ~33 ms RTT floor + ~30 MB/s through the tunnel, and per-block
    capacity padding was ~1.4x the real rows).

    The unoriented descriptor runs at FULL chunk capacity even though
    only ~45% of rows survive: compacting (packed, pn) to the kept
    bucket first was measured a -1.0 vol/s streams-mode regression at
    batch 12/3 (18.5 vs 19.4 back-to-back, round-4 isolation A/B) — the
    [cap, 1331] patch row gather costs more than the saved normalize +
    GoH on dead rows, even though forced-sync stage timing read the
    change as neutral. Same lesson as round 3's pre-padding: only
    end-to-end A/B counts on this compiler."""
    packed, descs = [], []
    for res_i, koff, kb, cap_all, cap_t, cap_s, cap_l in layout:
        sl = slice(koff, koff + kb)
        packed.append(
            fstage.pack_unoriented_stage(
                sel["kvalid"][sl], sel["cand"][sl], sel["xyz"][sl], sel["scale"][sl],
                sel["eigs"][sl], sel["eig_ori"][sl], cfg,
            )
        )
        descs.append(fstage.descriptor_stage(sel["pn"][sl], descriptor).astype(jnp.uint8))
        if reoriented and cap_all > 0:
            # all three scale buckets from ONE shared slot-grid
            # compaction (the per-bucket cumsum over [cap x K1*K2] flags
            # was ~45 ms of batch-12 phase-2c across chunks x buckets)
            for _, packed_b, patches_b in fstage.emit_reoriented_buckets(
                gstacks[res_i], sel["cand"][sl], sel["xyz"][sl], sel["scale"][sl],
                sel["kvalid"][sl], sel["eigs"][sl], sel["ori"][sl], sel["ori_valid"][sl],
                cfg, (cap_all, cap_t, cap_s, cap_l),
                g_dims=None if gdims is None else gdims[res_i],
            ):
                packed.append(packed_b)
                descs.append(
                    fstage.descriptor_stage(patches_b, descriptor).astype(jnp.uint8)
                )
    packed = jnp.concatenate(packed)
    descs = jnp.concatenate(descs)
    # one int32 buffer carries everything: geometry bitcast f32->int32 and
    # descriptor bytes packed 4-per-lane (int lanes, unlike f32, can never
    # hit NaN/subnormal canonicalization on select/copy)
    p32 = jax.lax.bitcast_convert_type(packed, jnp.int32)
    d32 = jax.lax.bitcast_convert_type(
        descs.reshape(descs.shape[0], 16, 4), jnp.int32
    )
    rows = jnp.concatenate([p32, d32], axis=1)  # [P, 35]
    keep = _scatter_compact(packed[:, 17] >= 0, out_cap)
    out = rows[jnp.clip(keep, 0)]
    # bucket-padding tail: order key < 0 so the host's key filter drops it
    pad = jax.lax.bitcast_convert_type(jnp.float32(-1.0), jnp.int32)
    return jnp.where((keep >= 0)[:, None], out, pad)


def _decode_candidates_np(mask_shape, gidx, blocks, group_count: int, size: int, fetch_mask):
    """Decode downloaded row-compacted entries to (lvl0, z, y, x, sign).

    gidx/blocks follow _compact_mask_one: gidx indexes X-rows of the
    flattened [nl*zd*yd, xd] mask; blocks are the rows' bytes.
    """
    nl, zd, yd, xd = mask_shape
    if group_count > size:
        # overflow (extremely textured volume): full fallback transfer
        mask = np.asarray(fetch_mask())
        lvls0, zs, ys, xs = np.nonzero(mask)
        return lvls0, zs, ys, xs, mask[lvls0, zs, ys, xs].astype(np.int32)
    gi = np.asarray(gidx[:group_count]).astype(np.int64)
    bl = np.asarray(blocks[:group_count])
    rows_nz, offs_nz = np.nonzero(bl)
    idx = gi[rows_nz] * xd + offs_nz
    sign = bl[rows_nz, offs_nz].astype(np.int32)
    lvls0, rem = np.divmod(idx, zd * yd * xd)
    zs, rem = np.divmod(rem, yd * xd)
    ys, xs = np.divmod(rem, xd)
    return lvls0, zs, ys, xs, sign


def _extract_candidates(res_mask, cap: int):
    """Returns (lvl0, zs, ys, xs, signs) numpy arrays from the device mask."""
    nl, zd, yd, xd = res_mask.shape
    size = min(cap, nl * zd * yd)
    gidx, blocks, gc, _ = _compact_mask(res_mask[None], size)
    return _decode_candidates_np(
        res_mask.shape, np.asarray(gidx[0]), np.asarray(blocks[0]), int(gc[0]), size,
        lambda: res_mask,
    )


def extract_features(
    img,
    cfg: SiftConfig = DEFAULT_CONFIG,
    initial_image_scale: float = 1.0,
    descriptor: str = "goh",
    reoriented: bool = True,
    timer: Optional[StageTimer] = None,
) -> FeatureSet:
    """Extract 3D SIFT features from a [Z, Y, X] volume.

    Equivalent of msGeneratePyramidDOG3D_efficient + the per-feature
    descriptor loop in featExtract.cpp:409-539. Returns features in voxel
    coordinates of the input volume.
    """
    return extract_features_many(
        [img], cfg, initial_image_scale=initial_image_scale, descriptor=descriptor,
        reoriented=reoriented, timer=timer,
    )[0]


def extract_features_many(
    imgs,
    cfg: SiftConfig = DEFAULT_CONFIG,
    initial_image_scale: float = 1.0,
    descriptor: str = "goh",
    reoriented: bool = True,
    timer: Optional[StageTimer] = None,
    device=None,
    pre_blurred: bool = False,
    streams: int = 1,
):
    """Extract features from several volumes with interleaved scheduling.

    All volumes advance through each pipeline phase together, so the
    handful of host synchronization points is paid once per *batch* rather
    than once per volume — on latency-bound runtimes this raises
    volumes/sec substantially over sequential extraction.

    device: optional jax.Device to pin the whole pipeline to. Every jitted
    phase follows its (committed) inputs, so committing the volume stack
    and the candidate upload is enough to keep all compute and all
    intermediates resident on that device — this is the building block of
    multi-chip data parallelism (sift3d.dist.batch places one volume group
    per mesh device and runs them concurrently).

    streams > 1 splits the batch round-robin into that many sub-batches
    and advances their pipelines in lockstep from ONE host thread: each
    stream's blocking host reads (candidate counts, row counts, the final
    download) run while the OTHER streams' already-dispatched device
    programs execute, so sync stalls and D2H transfer time hide behind
    compute. Single dispatch queue, no threads — unlike
    extract_features_stream this works on runtimes that serialize
    concurrent clients.
    """
    if streams > 1 and len(imgs) >= 2 * streams:
        subsets = [list(range(s, len(imgs), streams)) for s in range(streams)]
        outs = [[None] for _ in subsets]
        gens = [
            _extract_gen(
                [imgs[i] for i in sub], outs[k], cfg, initial_image_scale,
                descriptor, reoriented, timer, device, pre_blurred,
            )
            for k, sub in enumerate(subsets)
        ]
        live = list(gens)
        while live:
            for g in list(live):
                try:
                    next(g)
                except StopIteration:
                    live.remove(g)
        result = [None] * len(imgs)
        for sub, o in zip(subsets, outs):
            for i, f in zip(sub, o[0]):
                result[i] = f
        return result
    out = [None]
    for _ in _extract_gen(
        imgs, out, cfg, initial_image_scale, descriptor, reoriented, timer,
        device, pre_blurred,
    ):
        pass
    return out[0]


def _extract_gen(
    imgs,
    result_box,
    cfg: SiftConfig,
    initial_image_scale: float,
    descriptor: str,
    reoriented: bool,
    timer: Optional[StageTimer],
    device,
    pre_blurred: bool,
):
    """Pipeline body as a generator: yields right before every blocking
    host read so a driver can interleave multiple streams (see
    extract_features_many). Writes the per-volume FeatureSets into
    result_box[0] and returns."""
    timer = timer or StageTimer(enabled=False)
    sigmas = tuple(cfg.level_sigmas())
    n_vol = len(imgs)

    # profiling aid: block after every phase dispatch so the stage timer
    # reports true device cost per phase instead of async dispatch latency.
    # jax.block_until_ready returns without waiting on the axon relay
    # runtime (readiness is tracked client-side), so completion is forced
    # by fetching one element of one output — XLA programs complete as a
    # unit, so one 4-byte D2H (~33 ms RTT) gates the whole phase.
    import os

    def _sync_fetch(x):
        for leaf in jax.tree.leaves(x):
            if hasattr(leaf, "ravel") and leaf.size:
                jax.device_get(leaf.ravel()[:1])
                break
        return x

    _sync = _sync_fetch if os.environ.get("SIFT3D_SYNC_PHASES") else (lambda x: x)

    # volumes of the same shape advance together as ONE stacked batch:
    # per-dispatch host latency through the tunnel (~30 ms RTT) dominates
    # octave compute, so every phase below runs one program per
    # (shape-group, octave) instead of one per (volume, octave)
    if device is not None:
        arrs = [
            jax.device_put(
                img if isinstance(img, jax.Array) else np.asarray(img, np.float32),
                device,
            ).astype(jnp.float32)
            for img in imgs
        ]
    else:
        arrs = [jnp.asarray(img, dtype=jnp.float32) for img in imgs]
    groups: dict = {}
    for i, a in enumerate(arrs):
        groups.setdefault(tuple(a.shape), []).append(i)

    # phase 1: ONE dispatch per shape group runs the whole dense phase —
    # initial blur, all octaves' blur/DoG/extrema, and candidate
    # compaction (see _phase1_program)
    octave_results = []  # entries: (vol_ids, octave, res-dict, size)
    oct_dims = []  # logical (z, y, x) per octave_result (gstack may be padded)
    gcount_list = []
    cc_dev = []  # per octave_result: [B] DEVICE exact candidate counts
    cand_cap = 8 * cfg.max_candidates_per_level
    for shape, vol_ids in groups.items():
        stack = jnp.stack([arrs[i] for i in vol_ids])
        n_oct = pyramid.num_octaves(shape, cfg)
        sizes = []
        dims = []
        dz, dy, dx = shape
        for octave in range(n_oct):
            sizes.append(min(cand_cap, 3 * dz * dy))  # X-row groups
            dims.append((dz, dy, dx))
            dz, dy, dx = dz // 2, dy // 2, dx // 2
        if n_oct == 0:
            continue
        with timer.stage("phase1"):
            outs, counts = _sync(_phase1_program(
                stack, cfg, n_oct, tuple(sizes), initial_image_scale, pre_blurred
            ))
        for octave, o in enumerate(outs):
            octave_results.append((vol_ids, octave, o, sizes[octave]))
            oct_dims.append(dims[octave])
            cc_dev.append(counts[octave, :, 1])
        gcount_list.append(counts)

    if not octave_results:
        result_box[0] = [FeatureSet.empty(0) for _ in range(n_vol)]
        return

    # phase 1.5: one host round trip for every (group, octave, volume)
    # (group count, exact candidate count), then the candidate table is
    # built ON DEVICE (_phase15_tables_program) — the only host work is
    # choosing the static chunk layout from the synced counts
    yield  # stream switch point: the fetch below blocks on phase 1
    with timer.stage("candidate_counts"):
        cnts = np.concatenate(
            [np.asarray(c).reshape(-1, 2) for c in jax.device_get(gcount_list)]
        ).astype(np.int64)  # rows follow octave_results x volume order
    # pure-host candidate-layout work, timed separately so the host
    # residual of placement-DP is measurable on the real chip
    # (SCALING_r04 instrumentation, VERDICT r3 #5)
    with timer.stage("host_layout_cand"):
        pos = 0
        offs_c = []
        caps = []
        gbs = []
        overflow = False
        for (vol_ids, _, o, size) in octave_results:
            nb = len(vol_ids)
            offs_c.append(pos)
            n_grp_max = int(cnts[pos : pos + nb, 0].max())
            overflow = overflow or n_grp_max > size
            # slice the group tables to the group-count bucket first: the
            # second-level nonzero is linear in the bytes it scans
            gbs.append(_bucket(n_grp_max, size))
            xd = o["blocks"].shape[-1]
            caps.append(_bucket(int(cnts[pos : pos + nb, 1].max()), size * xd))
            pos += nb

    empty_result = [FeatureSet.empty(0) for _ in range(n_vol)]
    chunk = cfg.union_chunk
    chunk_meta = []  # (octave_result index, cap)
    if not (overflow or _FORCE_LEGACY_CANDIDATES):
        # exact per-volume counts are synced, so the chunk layout is
        # computable without touching the candidates themselves; the
        # table build then never leaves the device
        sel_ois, out_caps = [], []
        for oi, (vol_ids, _, _, _) in enumerate(octave_results):
            nb = len(vol_ids)
            n_cand = int(cnts[offs_c[oi] : offs_c[oi] + nb, 1].sum())
            if n_cand == 0:
                continue
            tot = 0
            for start in range(0, n_cand, chunk):
                cap = _bucket(min(start + chunk, n_cand) - start, chunk)
                chunk_meta.append((oi, cap))
                tot += cap
            sel_ois.append(oi)
            out_caps.append(tot)
        if not chunk_meta:
            result_box[0] = empty_result
            return
        with timer.stage("candidate_tables"):
            cand_all = _sync(_phase15_tables_program(
                tuple(octave_results[oi][2]["gidx"][:, : gbs[oi]] for oi in sel_ois),
                tuple(octave_results[oi][2]["blocks"][:, : gbs[oi]] for oi in sel_ois),
                tuple(cc_dev[oi] for oi in sel_ois),
                tuple(caps[oi] for oi in sel_ois),
                tuple(out_caps),
                tuple(
                    tuple(octave_results[oi][2]["mask"].shape[1:]) for oi in sel_ois
                ),
            ))
    else:
        # group-table overflow somewhere (extremely textured volume):
        # legacy host path — download exact candidates (or the full mask
        # for the overflowing volumes), decode/sort/pack on host, upload
        with timer.stage("candidate_extract"):
            exact = _sync(_phase15_program(
                tuple(
                    o["gidx"][:, :gb]
                    for gb, (_, _, o, _) in zip(gbs, octave_results)
                ),
                tuple(
                    o["blocks"][:, :gb]
                    for gb, (_, _, o, _) in zip(gbs, octave_results)
                ),
                tuple(caps),
            ))
        yield  # stream switch point (legacy path): blocking download below
        with timer.stage("candidate_download"):
            host = jax.device_get([x for pair in exact for x in pair])
            idx_np = host[0::2]
            sign_np = host[1::2]

        # decode candidates on the host into per-chunk packed tables.
        # Candidates are ordered (volume, level, sign, z, y, x) so the
        # per-volume reference emission order survives the union split.
        # ALL chunks then ship in ONE upload.
        cand_parts = []  # packed [cap, 6] host tables, dispatch order
        for oi, (vol_ids, octave, res, size) in enumerate(octave_results):
            with timer.stage(f"octave{octave}/candidates"):
                nl, zd, yd, xd = res["mask"].shape[1:]
                parts = []
                for b in range(len(vol_ids)):
                    pos = offs_c[oi]
                    n_grp, n_cand_b = int(cnts[pos + b, 0]), int(cnts[pos + b, 1])
                    if n_grp > size:
                        # full mask fallback transfer
                        mask = np.asarray(res["mask"][b])
                        lvls0, zs, ys, xs = np.nonzero(mask)
                        signs = mask[lvls0, zs, ys, xs].astype(np.int32)
                    else:
                        idx = idx_np[oi][b][:n_cand_b].astype(np.int64)
                        signs = sign_np[oi][b][:n_cand_b].astype(np.int32)
                        lvls0, rem = np.divmod(idx, zd * yd * xd)
                        zs, rem = np.divmod(rem, yd * xd)
                        ys, xs = np.divmod(rem, xd)
                    if lvls0.size == 0:
                        continue
                    dog_lvl = (lvls0 + 1).astype(np.int32)
                    # reference emission order: per level, valleys then
                    # peaks, scan order (generateFeatures3D_efficient
                    # loops); a stable single-key sort on (lvl, sign)
                    # over the already-ascending rows reproduces it
                    order = np.argsort(dog_lvl * 2 + (signs > 0), kind="stable")
                    parts.append(
                        (
                            np.full(order.shape, b, np.int32),
                            dog_lvl[order],
                            zs[order].astype(np.int32),
                            ys[order].astype(np.int32),
                            xs[order].astype(np.int32),
                            signs[order],
                        )
                    )
                if not parts:
                    continue
                cols = [np.concatenate([p[k] for p in parts]) for k in range(6)]

            n_cand = cols[1].shape[0]
            for start in range(0, n_cand, chunk):
                end = min(start + chunk, n_cand)
                # pad to the smallest shape bucket: padded capacity is
                # wasted compute. Padding rows have sign == 0 (invalid).
                cap = _bucket(end - start, chunk)
                cand = _pad_to(
                    np.stack([c[start:end] for c in cols], axis=1).astype(np.int32),
                    cap,
                    fill=0,
                )
                cand[end - start :, 1] = 1  # padding level inside gather range
                cand_parts.append(cand)
                chunk_meta.append((oi, cap))

        if not cand_parts:
            result_box[0] = empty_result
            return
        with timer.stage("cand_upload"):
            cand_host = np.concatenate(cand_parts, axis=0)
            cand_all = (
                jax.device_put(cand_host, device) if device is not None
                else jnp.asarray(cand_host)
            )

    stacks = tuple((res["gstack"], res["dogs"]) for (_, _, res, _) in octave_results)
    layout_a = tuple(chunk_meta)
    with timer.stage("phase2a"):
        r2a = _sync(_phase2a_program(stacks, cand_all, layout_a, sigmas, cfg))
    # the DoG stacks, extrema masks and compaction buffers are dead once
    # phase 2a is dispatched (2b/2c touch only the Gaussian stacks): drop
    # the references so ~45% of the batch's HBM footprint frees early —
    # this is what lets extract_features_stream keep two batches in flight
    # split bf16 mode: 2b/2c read the bf16 copy and the exact-f32 stack
    # frees with the rest of the phase-1 buffers (2c rotated kernels
    # round to bf16 in-kernel, so their output is bit-identical)
    gstacks = tuple(
        res["gstack16"] if "gstack16" in res else res["gstack"]
        for (_, _, res, _) in octave_results
    )
    del stacks
    for (_, _, res, _) in octave_results:
        for key in ("dogs", "mask", "gidx", "blocks"):
            res.pop(key, None)
        if "gstack16" in res:
            res.pop("gstack", None)

    # phase 2b: dispatched immediately with NO host sync between 2a and
    # 2b — every chunk runs at its phase-2a capacity (non-survivor rows
    # ride along masked by kvalid), so the device flows straight from the
    # gather/eig program into the canonical-orientation histograms. The
    # per-chunk kept counts come back in counts_d[:, 3].
    a_offs = np.concatenate([[0], np.cumsum([cap for _, cap in chunk_meta])])
    layout_b = tuple(
        (int(a_offs[i]), cap) for i, (_, cap) in enumerate(chunk_meta)
    )
    with timer.stage("phase2b"):
        sel, counts_d = _sync(_phase2b_program(
            r2a["keep_rows"], cand_all, r2a["pn"], r2a["eigs"], r2a["eig_ori"],
            r2a["xyz"], r2a["scale"], layout_b, cfg, reoriented,
        ))

    # phase 2c: ONE sync for all per-chunk [total, tiny, small, kept] row
    # counts, then the split emission: unoriented rows reuse the
    # gather-stage patches (no resampling); only reoriented rows pay the
    # rotated-patch resampling, bucketed by scale into right-sized
    # sampler passes
    yield  # stream switch point: the fetch below blocks on phase 2b
    with timer.stage("row_counts"):
        counts = np.asarray(counts_d).astype(np.int64)  # [n_chunks, 4]
    surv = [i for i in range(len(chunk_meta)) if counts[i, 3] > 0]
    if not surv:
        result_box[0] = empty_result
        return
    with timer.stage("host_layout_rows"):
        layout_c = []
        blocks: dict = {}
        p_off = 0
        # hard upper bound on reoriented rows per chunk: every candidate
        # can emit at most min(K1*K2, max_orientations) copies — using it
        # as the bucket cap makes silent truncation structurally
        # impossible (a fixed 16*chunk cap would truncate if
        # max_orientations were raised past 16)
        s_tot = cfg.max_primary_orientations * cfg.max_secondary_orientations
        cap_limit = chunk * max(1, min(s_tot, cfg.max_orientations))
        # the rotated samplers row-chunk at 256 (patch.py rc), so any cap
        # > 256 must divide by it; rounding the limit UP only adds padding
        cap_limit = -(-cap_limit // 256) * 256
        for j, i in enumerate(surv):
            cap = chunk_meta[i][1]
            n_kept = int(counts[i, 3])
            n_tiny = int(counts[i, 1])
            n_small = int(counts[i, 2])
            n_large = int(counts[i, 0]) - n_kept - n_tiny - n_small
            caps = tuple(
                _bucket(n, cap_limit) if (reoriented and n > 0) else 0
                for n in (n_tiny, n_small, n_large)
            )
            # shared-compaction capacity: every reoriented row of the
            # chunk, any bucket (emit_reoriented_buckets' cap_all)
            n_reor = n_tiny + n_small + n_large
            cap_all = _bucket(n_reor, cap_limit) if (reoriented and n_reor > 0) else 0
            layout_c.append((chunk_meta[i][0], int(a_offs[i]), cap, cap_all) + caps)
            # block offsets into the COMPACTED download buffer: the
            # program packs each block's valid rows contiguously in block
            # order, so exact counts (known from the phase-2b sync) give
            # exact slices
            blocks[j] = [(p_off, n_kept)]
            p_off += n_kept
            for n_b, cap_b in zip((n_tiny, n_small, n_large), caps):
                if cap_b > 0:
                    blocks[j].append((p_off, n_b))
                    p_off += n_b
        out_cap = _bucket_fine(p_off)
    with timer.stage("phase2c"):
        # gdims: logical octave dims when the gstacks carry the slab-DMA
        # padding (TPU phase-1 layout); None when unpadded (CPU)
        padded = gstacks[0].shape[-2] != oct_dims[0][1]
        rows_all = _sync(_phase2c_program(
            gstacks, sel, tuple(layout_c), cfg, descriptor, reoriented, out_cap,
            gdims=tuple(oct_dims) if padded else None,
        ))
    yield  # stream switch point: the download blocks on phase 2c
    with timer.stage("download"):
        host_rows = np.asarray(rows_all)  # [out_cap, 35] int32 (bit carrier)
        host_p = np.ascontiguousarray(host_rows[:, :19]).view(np.float32)
        host_d = np.ascontiguousarray(host_rows[:, 19:35]).view(np.uint8).reshape(-1, 64)

    pending = [
        dict(vol_ids=octave_results[chunk_meta[i][0]][0], octave=octave_results[chunk_meta[i][0]][1])
        for i in surv
    ]
    with timer.stage("assembly"):
        per_vol = [[] for _ in range(n_vol)]
        for pi, p in enumerate(pending):
            bufs = [host_p[o : o + n] for o, n in blocks[pi]]
            descs = [host_d[o : o + n] for o, n in blocks[pi]]
            buf = np.concatenate(bufs)
            dsc = np.concatenate(descs)
            keep_mask = buf[:, 17] >= 0
            buf, dsc = buf[keep_mask], dsc[keep_mask]
            order = np.argsort(buf[:, 17], kind="stable")  # reference push order
            buf, dsc = buf[order], dsc[order]
            factor = np.float32(2.0 ** p["octave"])  # octave scaling (MultiScale.cpp:531-543)
            for b, vol_i in enumerate(p["vol_ids"]):
                sel = buf[:, 18] == b
                if not sel.any():
                    continue
                per_vol[vol_i].append(
                    FeatureSet(
                        xyz=buf[sel, 0:3] * factor,
                        scale=buf[sel, 3] * factor,
                        eigs=buf[sel, 4:7],
                        ori=buf[sel, 7:16].reshape(-1, 3, 3),
                        info=buf[sel, 16].astype(np.uint32),
                        desc=dsc[sel].astype(np.float32),
                    )
                )
        out = [FeatureSet.concatenate(s) for s in per_vol]
    result_box[0] = out


def extract_features_stream(
    imgs,
    cfg: SiftConfig = DEFAULT_CONFIG,
    initial_image_scale: float = 1.0,
    descriptor: str = "goh",
    reoriented: bool = True,
    batch_size: int = 8,
    streams: int = 2,
):
    """Extract features from many volumes with double-buffered batches.

    Splits the volumes into `batch_size` batches and runs `streams`
    extract_features_many calls concurrently on worker threads. The
    pipeline's host phases (candidate decode, feature assembly) and its
    blocking device fetches release the GIL, so one batch's host work
    overlaps another batch's device compute and D2H transfers — the
    steady-state cost per batch approaches max(host, device) instead of
    their sum. Device programs from both streams interleave in the one
    TPU execution queue (no contention: dispatch order is preserved).

    HARDWARE-DEPENDENT: the overlap assumes the runtime serves two
    in-flight clients fairly. On a direct-attached TPU host it does; on
    the remote-relay runtime used for benching, concurrent clients
    serialize pathologically (measured < 0.5 vol/s vs 19+ for
    extract_features_many at batch 12 — PERFORMANCE.md "did NOT pay
    off"). Measure on YOUR runtime before preferring this entry point;
    extract_features_many with a large batch is the safe default.

    Returns FeatureSets in input order.
    """
    import concurrent.futures

    batches = [
        (start, imgs[start : start + batch_size])
        for start in range(0, len(imgs), batch_size)
    ]
    if len(batches) <= 1 or streams <= 1:
        return extract_features_many(
            imgs, cfg, initial_image_scale=initial_image_scale,
            descriptor=descriptor, reoriented=reoriented,
        )

    out = [None] * len(imgs)
    def run(item):
        start, chunk = item
        return start, extract_features_many(
            chunk, cfg, initial_image_scale=initial_image_scale,
            descriptor=descriptor, reoriented=reoriented,
        )

    with concurrent.futures.ThreadPoolExecutor(max_workers=streams) as ex:
        for start, feats in ex.map(run, batches):
            out[start : start + len(feats)] = feats
    return out
