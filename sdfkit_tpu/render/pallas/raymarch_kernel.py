"""Fused Pallas sphere-trace kernel.

The reference's hot loop is RayMarcher.Render (RayMarcher.cs:131-162): 40
march iterations + 6 gradient taps + Lambert shading per ray, with the AVX
MulAdd fast path (VectorData.cs:735-800) as its only hand-tuned kernel. Here
the whole pipeline — march, finite-difference normal, shading, sky mask —
runs as ONE Pallas kernel per ray tile: rays are loaded from HBM once, all 46
SDF evaluations happen against VMEM-resident registers, and depth+RGB are
written once. The pure-jnp path (render/raymarch.py) re-reads the ray arrays
from HBM every fori_loop iteration.

Scene parameters enter through SMEM as flattened pytree leaves, so the same
compiled kernel serves any parameter values (no recompile per scene edit) and
`jax.custom_vjp` can route gradients: forward = this kernel, backward =
checkpointed replay through the jnp path (bit-identical math).

Ray layout: the (H, W) image is flattened and padded to (rows, 128) f32
tiles — structure-of-arrays per component, so every vector lane does useful
work (see utils/v3.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdfkit_tpu.render import raymarch as rm
from sdfkit_tpu.utils.v3 import V3

# Rows of 128 lanes per grid step. Swept on v5e at 1080p (r3, chained
# frames, RTT-corrected): 64 -> 2.67 ms, 128 -> 2.57, 192 -> 2.47,
# 256 -> 2.45, 384 -> 2.80, 512 -> 3.12, 768 -> 3.40, 1024 OOMs scoped VMEM.
# Small tiles win: the march intermediates of a 256x128 tile fit the 16 MB
# scoped-VMEM budget with room for double buffering, while >=384 rows push
# Mosaic into spilling. (The r2 regression to 3.27 ms was exactly this —
# BLOCK_ROWS=512 chosen from a sweep taken before the kernel grew its
# shading/backward structure.)
BLOCK_ROWS = 256


def _final_shade(sdf, ro: V3, rd: V3, depth, cfg: rm.RenderConfig):
    """The last march step (the sample whose RGB becomes the diffuse color,
    RayMarcher.cs:142-144) plus normal estimation and Lambert shading.
    ``depth`` is the accumulated depth after n-1 march steps. Returns
    (final depth, shaded rgb V3). Loop-free, so its jax.vjp inside the
    backward kernel carries only O(tile) residuals."""
    pos = ro + rd * depth
    color, dist = sdf.eval(pos)
    diffuse = V3(
        jnp.broadcast_to(color.x, dist.shape),
        jnp.broadcast_to(color.y, dist.shape),
        jnp.broadcast_to(color.z, dist.shape),
    )
    depth = depth + dist

    bg = depth > cfg.far
    # Sanitized branch input for miss rays — see render/raymarch.py
    # render_rays for why (keeps reverse-mode finite).
    shade_depth = jnp.where(bg, jnp.float32(cfg.near), depth)
    surface = ro + rd * shade_depth
    e = jnp.float32(rm.GRAD_OFFSET)

    def d_at(dx, dy, dz):
        return sdf.distance(V3(surface.x + dx, surface.y + dy, surface.z + dz))

    normal = V3(
        d_at(e, 0.0, 0.0) - d_at(-e, 0.0, 0.0),
        d_at(0.0, e, 0.0) - d_at(0.0, -e, 0.0),
        d_at(0.0, 0.0, e) - d_at(0.0, 0.0, -e),
    ).safe_normalize()
    # Python-float components (not arrays) so the kernel captures no consts.
    lx, ly, lz = rm.LIGHT_POSITION
    light = (V3(lx, ly, lz) - surface).safe_normalize()
    lambert = jnp.maximum(normal.dot(light), 0.0)
    lighting = diffuse * lambert + jnp.float32(rm.AMBIENT)

    out = lighting.where(~bg, V3(*rm.SKY_COLOR))
    return depth, out


def _march_and_shade(sdf, ro: V3, rd: V3, cfg: rm.RenderConfig,
                     want_color: bool, store_ref=None):
    """The per-tile computation (identical math to render/raymarch.py).

    ``store_ref``: optional (n, BR, 128) VMEM/HBM ref; when given, the
    pre-step depth of iterations 0..n-2 and the final pre-shade depth are
    written to it — the depth history the backward kernel needs, so a
    gradient-bearing forward hands it over instead of the backward
    re-marching the whole ray (VERDICT r3 item 4: the replay was ~29% of
    the backward's lane ops)."""
    depth = ro.x * 0.0 + jnp.float32(cfg.near - 0.1)
    n = cfg.depth_iterations

    def body(i, depth):
        if store_ref is not None:
            store_ref[i] = depth
        pos = ro + rd * depth
        return depth + sdf.distance(pos)

    if not want_color:
        depth = jax.lax.fori_loop(0, n - 1, body, depth)
        if store_ref is not None:
            store_ref[n - 1] = depth
        return depth + sdf.distance(ro + rd * depth), None

    depth = jax.lax.fori_loop(0, n - 1, body, depth)
    if store_ref is not None:
        store_ref[n - 1] = depth
    return _final_shade(sdf, ro, rd, depth, cfg)


# Scene parameters enter the kernel one of two ways, picked by size:
# - <= SMEM_PARAM_SCALARS: one SMEM (1, k) array per pytree leaf, rebuilt
#   with scalar loads (free for hand-built scenes of tens of scalars).
# - larger trees (the differentiable-fitting use case — a 200-primitive CSG
#   tree is ~1400 scalars): ALL leaves concatenated into one VMEM (1, N)
#   block, rebuilt with static per-element loads. This lifts the old
#   1024-scalar SMEM ceiling (VERDICT r3 item 5); the remaining cap only
#   bounds Mosaic compile time (the rebuild unrolls N loads per grid step).
SMEM_PARAM_SCALARS = 1024
MAX_FUSED_PARAM_SCALARS = 8192


def _param_total(shapes) -> int:
    return sum(int(np.prod(s)) if s else 1 for s in shapes)


def _flatten_params(sdf):
    """Pytree leaves -> kernel param arrays + rebuild info.

    Returns (arrays, treedef, shapes): one (1, k) array per leaf for the
    SMEM path, or a single (1, N) concatenated array for the VMEM path
    (len(arrays) == 1 and N > SMEM_PARAM_SCALARS distinguishes them —
    _param_specs/_rebuild make the same size-based choice)."""
    leaves, treedef = jax.tree_util.tree_flatten(sdf)
    shapes = [jnp.shape(l) for l in leaves]
    total = _param_total(shapes)
    if total > MAX_FUSED_PARAM_SCALARS:
        raise ValueError(
            f"scene has {total} parameter scalars; the fused Pallas backend "
            f"unrolls a per-element rebuild and is capped at "
            f"{MAX_FUSED_PARAM_SCALARS} to bound compile time — use "
            f"backend='jnp' for larger scene trees"
        )
    if total <= SMEM_PARAM_SCALARS:
        return (
            [jnp.asarray(l, jnp.float32).reshape(1, -1) for l in leaves],
            treedef,
            shapes,
        )
    flat = (
        jnp.concatenate(
            [jnp.asarray(l, jnp.float32).reshape(-1) for l in leaves]
        )
        if leaves
        else jnp.zeros((0,), jnp.float32)
    )
    return [flat.reshape(1, -1)], treedef, shapes


def _param_specs(params, shapes):
    """BlockSpecs for the param arrays (SMEM per leaf, or one VMEM block)."""
    if len(params) == len(shapes) and _param_total(shapes) <= SMEM_PARAM_SCALARS:
        return [pl.BlockSpec(memory_space=pltpu.SMEM)] * len(params)
    return [pl.BlockSpec(memory_space=pltpu.VMEM)]


def _rebuild(treedef, shapes, refs):
    """Reassemble the sdf pytree from param refs with static scalar loads
    (SMEM per-leaf refs, or one packed VMEM ref)."""
    leaves = []
    if len(refs) == len(shapes) and _param_total(shapes) <= SMEM_PARAM_SCALARS:
        for i, shp in enumerate(shapes):
            k = 1
            for d in shp:
                k *= d
            vals = [refs[i][0, j] for j in range(k)]
            leaves.append(vals[0] if shp == () else jnp.stack(vals).reshape(shp))
    else:
        (ref,) = refs
        pos = 0
        for shp in shapes:
            k = 1
            for d in shp:
                k *= d
            vals = [ref[0, pos + j] for j in range(k)]
            pos += k
            leaves.append(vals[0] if shp == () else jnp.stack(vals).reshape(shp))
    return jax.tree_util.tree_unflatten(treedef, leaves)


@partial(jax.jit, static_argnums=(3, 4, 5))
def _pallas_render_flat(params_smem, ro6, rd6, meta, cfg, want_color):
    """params_smem: list of (1,k) leaves; ro6/rd6: (3, rows, 128) f32."""
    treedef, shapes = meta
    rows = ro6.shape[1]
    n_leaves = len(params_smem)
    grid = (rows // BLOCK_ROWS,)

    def kernel(*refs):
        leaf_refs = refs[:n_leaves]
        ro_ref, rd_ref = refs[n_leaves], refs[n_leaves + 1]
        out_refs = refs[n_leaves + 2 :]
        sdf = _rebuild(treedef, shapes, leaf_refs)
        ro = V3(ro_ref[0], ro_ref[1], ro_ref[2])
        rd = V3(rd_ref[0], rd_ref[1], rd_ref[2])
        depth, color = _march_and_shade(sdf, ro, rd, cfg, want_color)
        if want_color:
            # RGB only — the depth plane would be dead output (see the
            # image-level kernel below).
            out_refs[0][0] = color.x
            out_refs[0][1] = color.y
            out_refs[0][2] = color.z
        else:
            out_refs[0][...] = depth

    ray_spec = pl.BlockSpec(
        (3, BLOCK_ROWS, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    depth_spec = pl.BlockSpec(
        (BLOCK_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    if want_color:
        out_shape = [jax.ShapeDtypeStruct((3, rows, 128), jnp.float32)]
        out_specs = [ray_spec]
    else:
        out_shape = [jax.ShapeDtypeStruct((rows, 128), jnp.float32)]
        out_specs = [depth_spec]

    results = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_param_specs(params_smem, shapes)
        + [ray_spec, ray_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=jax.default_backend() == "cpu",
    )(*params_smem, ro6, rd6)
    return results


def _pack_rays(v: V3):
    """(H, W) V3 -> (3, rows, 128) padded f32, plus original size."""
    flat = jnp.stack(
        [jnp.ravel(v.x), jnp.ravel(v.y), jnp.ravel(v.z)]
    )  # (3, N)
    n = flat.shape[1]
    tile = BLOCK_ROWS * 128
    padded = ((n + tile - 1) // tile) * tile
    flat = jnp.pad(flat, ((0, 0), (0, padded - n)))
    return flat.reshape(3, padded // 128, 128), n


def render_rays_fused(sdf, ro: V3, rd: V3, cfg: rm.RenderConfig):
    """Fused-kernel version of render_rays: (..., 3) RGB image."""
    return _render_fused_impl(sdf, ro, rd, cfg, True)


def render_depth_rays_fused(sdf, ro: V3, rd: V3, cfg: rm.RenderConfig):
    return _render_fused_impl(sdf, ro, rd, cfg, False)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _render_fused_impl(sdf, ro, rd, cfg, want_color):
    shape = ro.shape
    ro6, n = _pack_rays(ro)
    rd6, _ = _pack_rays(rd)
    params, treedef, shapes = _flatten_params(sdf)
    results = _pallas_render_flat(
        params, ro6, rd6, (treedef, tuple(shapes)), cfg, want_color
    )
    if not want_color:
        return results[0].reshape(-1)[:n].reshape(shape)
    rgb = results[0].reshape(3, -1)[:, :n]
    return jnp.stack(
        [rgb[0].reshape(shape), rgb[1].reshape(shape), rgb[2].reshape(shape)],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# Image-level fused kernel: camera-ray generation happens INSIDE the kernel.
#
# The ray-based kernel above still pays two full-frame HBM round trips that
# the jnp path does not: packing (H, W) ro/rd into padded (3, rows, 128)
# tiles and reading them back in the kernel (~75 MB of extra traffic at
# 1080p). Per-pixel rays are just an affine function of the pixel index —
# GetCameraRays unprojects (x, y, 0, 1) through inverse(view @ proj)
# (reference: RayMarcher.cs:95-126) — so the kernel can synthesize them from
# 16 + 3 SMEM scalars and a broadcasted_iota, leaving the OUTPUT image as the
# only full-frame HBM traffic of the whole render.
# ---------------------------------------------------------------------------


def _rays_from_scalars(ivp16, cam3, width: int, height: int, block_rows: int,
                       pix0=0):
    """Per-lane ray origin/direction from the flat pixel index, given the
    inverse(view @ proj) matrix as a (16,) array and the camera position as a
    (3,) array — plain jnp inputs so the backward kernel can jax.vjp through
    ray generation to the view scalars.

    ``pix0`` is the global flat-pixel index of this program's first lane —
    nonzero when the kernel renders one row band of a larger image (the
    shard_map path: each device's kernel gets pix0 = axis_index * band
    pixels, the multi-chip analogue of the reference's row-band partitioning,
    RayMarcher.cs:50-61). It may be a traced scalar; the kernel is compiled
    once for all offsets.

    Identical math to utils/camera.camera_rays: NDC uses /(width-1) and
    /(height-1) denominators, y flipped so row 0 is the image top.
    """
    npix = width * height
    pid = pl.program_id(0)
    row = jax.lax.broadcasted_iota(jnp.int32, (block_rows, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (block_rows, 128), 1)
    idx = pix0 + (pid * block_rows + row) * 128 + lane
    # Clamp padding lanes onto the last real pixel so their (discarded)
    # marches stay finite.
    idx = jnp.minimum(idx, npix - 1)
    py = idx // width
    px = idx - py * width
    xf = -1.0 + 2.0 * px.astype(jnp.float32) / max(width - 1, 1)
    yf = 1.0 - 2.0 * py.astype(jnp.float32) / max(height - 1, 1)

    m = [ivp16[k] for k in range(16)]  # inverse(view @ proj), row-major
    hx = xf * m[0] + yf * m[4] + m[12]
    hy = xf * m[1] + yf * m[5] + m[13]
    hz = xf * m[2] + yf * m[6] + m[14]
    hw = xf * m[3] + yf * m[7] + m[15]
    pos = V3(hx / hw, hy / hw, hz / hw)
    ro = V3(
        jnp.broadcast_to(cam3[0], (block_rows, 128)),
        jnp.broadcast_to(cam3[1], (block_rows, 128)),
        jnp.broadcast_to(cam3[2], (block_rows, 128)),
    )
    rd = (pos - ro).normalize()
    return ro, rd


def _rays_from_index(ivp_ref, cam_ref, pix_ref, width: int, height: int):
    """Ray generation from SMEM refs (forward-kernel entry)."""
    ivp16 = jnp.stack([ivp_ref[0, k] for k in range(16)])
    cam3 = jnp.stack([cam_ref[0, k] for k in range(3)])
    return _rays_from_scalars(
        ivp16, cam3, width, height, BLOCK_ROWS, pix_ref[0, 0]
    )


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def _pallas_render_image_flat(params_smem, ivp, cam, pix0, meta, cfg,
                              want_color, local_npix: int,
                              want_store: bool = False):
    """ivp: (1, 16) inverse(view@proj); cam: (1, 3) camera position;
    pix0: (1, 1) int32 global flat-pixel offset of this kernel's first lane
    (0 for a whole-image render; the shard row-band offset under shard_map).
    ``local_npix`` is the pixel count THIS kernel renders (<= width*height).
    ``want_store`` adds an (n_iters, rows, 128) depth-history output — the
    march residuals the backward kernel consumes (see _march_and_shade)."""
    treedef, shapes = meta
    n_leaves = len(params_smem)
    tile = BLOCK_ROWS * 128
    rows = ((local_npix + tile - 1) // tile) * BLOCK_ROWS
    grid = (rows // BLOCK_ROWS,)
    n = cfg.depth_iterations

    def kernel(*refs):
        leaf_refs = refs[:n_leaves]
        ivp_ref, cam_ref = refs[n_leaves], refs[n_leaves + 1]
        pix_ref = refs[n_leaves + 2]
        out_refs = refs[n_leaves + 3 :]
        store_ref = out_refs[1] if want_store else None
        sdf = _rebuild(treedef, shapes, leaf_refs)
        ro, rd = _rays_from_index(
            ivp_ref, cam_ref, pix_ref, cfg.width, cfg.height
        )
        depth, color = _march_and_shade(
            sdf, ro, rd, cfg, want_color, store_ref
        )
        if want_color:
            # RGB only: the depth plane would be dead output — skipping it
            # saves a full-frame HBM write per render.
            out_refs[0][0] = color.x
            out_refs[0][1] = color.y
            out_refs[0][2] = color.z
        else:
            out_refs[0][...] = depth

    depth_spec = pl.BlockSpec(
        (BLOCK_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    rgb_spec = pl.BlockSpec(
        (3, BLOCK_ROWS, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    if want_color:
        out_shape = [jax.ShapeDtypeStruct((3, rows, 128), jnp.float32)]
        out_specs = [rgb_spec]
    else:
        out_shape = [jax.ShapeDtypeStruct((rows, 128), jnp.float32)]
        out_specs = [depth_spec]
    if want_store:
        out_shape.append(
            jax.ShapeDtypeStruct((n, rows, 128), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec(
                (n, BLOCK_ROWS, 128), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            )
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_param_specs(params_smem, shapes)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=jax.default_backend() == "cpu",
    )(*params_smem, ivp, cam, pix0)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _render_image_fused_impl(sdf, view, cfg, want_color):
    params, treedef, shapes = _flatten_params(sdf)
    ivp, cam_pos = _view_to_ivp_cam(view, cfg)
    npix = cfg.width * cfg.height
    results = _pallas_render_image_flat(
        params, ivp, cam_pos, jnp.zeros((1, 1), jnp.int32),
        (treedef, tuple(shapes)), cfg, want_color, npix
    )
    if not want_color:
        return results[0].reshape(-1)[:npix].reshape(cfg.height, cfg.width)
    rgb = results[0].reshape(3, -1)[:, :npix]
    return jnp.stack(
        [c.reshape(cfg.height, cfg.width) for c in rgb], axis=-1
    )


# ---------------------------------------------------------------------------
# Backward kernel: the pullback of the fused render, itself one Pallas kernel
# per ray tile (SURVEY §7 hard part (b); VERDICT r1 item 1).
#
# Reverse mode through the 40-iteration march needs the pre-step depth of
# every iteration. The jnp autodiff path materializes those as ~40 full-frame
# HBM residuals (40 x 8.3 MB at 1080p, written forward and re-read backward).
# Here the backward kernel REPLAYS the march per tile, storing the 39 pre-step
# depths in a (39, BWD_BLOCK_ROWS, 128) VMEM scratch (~2.6 MB) that never
# touches HBM, then runs:
#   1. jax.vjp of the loop-free final step + shading (O(tile) residuals),
#   2. a reverse fori_loop over the stored depths, each step a jax.vjp of a
#      single SDF evaluation (recomputed fresh — O(tile) residuals),
#   3. jax.vjp of in-kernel ray generation back to the 16+3 view scalars.
# Parameter/view gradients are scalars accumulated across grid steps in an
# SMEM output (grid steps run sequentially on TPU, so read-modify-write to a
# revisited block is the standard accumulator pattern). Total HBM traffic of
# the whole backward: the cotangent image in, 19 + n_params scalars out.
# ---------------------------------------------------------------------------

BWD_BLOCK_ROWS = 128  # 39-deep depth store = 39*128*128*4 B = 2.6 MB VMEM
# r4 sweep on v5e at 1080p (replay backward): 64 -> 11.34 ms, 128 -> 10.83,
# >=192 overflows scoped VMEM. A forward->backward depth-history HANDOFF
# (storing the march depths in the forward and reading them as a backward
# input, skipping the replay) was built and measured: the history block must
# be double-buffered as a pipelined input, which forces 64-row tiles, and
# the narrower tiles cost more than the skipped replay saves (11.36 ms vs
# 10.83). The replay formulation stays; BWD_BLOCK_ROWS_STORE sizes the
# handoff variant should the VMEM budget ever grow. The full lane-op census
# (bench.py bench_roofline) settles why no variant reaches the once-hoped
# ~7 ms: fwd+bwd light speed is 10.36 ms of VPU ops at this scene, and the
# measured grad_ms is 10.1-10.8 — the backward already runs at its roofline.
BWD_BLOCK_ROWS_STORE = 64


@partial(jax.jit, static_argnums=(6, 7, 8, 9))
def _pallas_render_image_bwd(params_smem, ivp, cam, pix0, g_packed, store,
                             meta, cfg, want_color, local_npix: int):
    """Returns a (1, n_scalars) f32 array: concatenated cotangents for every
    flattened sdf leaf, then the 16 ivp entries, then the 3 camera entries.
    ``pix0``/``local_npix``: see _pallas_render_image_flat.

    ``store``: the forward kernel's (n, rows_fwd, 128) depth history, or
    None. With a store, the backward skips its forward replay entirely and
    reads the per-step depths from the handed-over history (the replay was
    ~29%% of the backward's lane ops); without one (the shard_map row-band
    path), it re-marches into a VMEM scratch as before."""
    treedef, shapes = meta
    n_leaves = len(params_smem)
    n_param_scalars = sum(
        int(np.prod(s)) if s else 1 for s in shapes
    )
    n_out = n_param_scalars + 19
    small_params = n_param_scalars <= SMEM_PARAM_SCALARS
    # The store-handoff variant reads its (n, BR, 128) depth history as a
    # double-buffered INPUT block; at 128 rows that overflows the 16 MB
    # scoped-VMEM budget by ~0.3 MB, so it runs narrower tiles.
    br = BWD_BLOCK_ROWS_STORE if store is not None else BWD_BLOCK_ROWS
    tile = br * 128
    if store is not None:
        rows = store.shape[1]  # forward-padded rows (mult of BLOCK_ROWS)
    else:
        rows = ((local_npix + tile - 1) // tile) * br
    grid = (rows // br,)
    n = cfg.depth_iterations

    def kernel(*refs):
        leaf_refs = refs[:n_leaves]
        ivp_ref, cam_ref = refs[n_leaves], refs[n_leaves + 1]
        pix_ref = refs[n_leaves + 2]
        g_ref = refs[n_leaves + 3]
        if store is not None:
            store_ref = refs[n_leaves + 4]  # forward depth history (input)
            out_ref = refs[n_leaves + 5]
        else:
            out_ref = refs[n_leaves + 4]
            store_ref = refs[n_leaves + 5]  # VMEM scratch for the replay

        sdf = _rebuild(treedef, shapes, leaf_refs)
        ivp16 = jnp.stack([ivp_ref[0, k] for k in range(16)])
        cam3 = jnp.stack([cam_ref[0, k] for k in range(3)])

        def rays_fn(ivp16, cam3):
            ro, rd = _rays_from_scalars(
                ivp16, cam3, cfg.width, cfg.height, br, pix_ref[0, 0]
            )
            return ro.x, ro.y, ro.z, rd.x, rd.y, rd.z

        rays, rays_vjp = jax.vjp(rays_fn, ivp16, cam3)
        rox, roy, roz, rdx, rdy, rdz = rays
        ro = V3(rox, roy, roz)
        rd = V3(rdx, rdy, rdz)

        if store is not None:
            # Depth history handed over by the forward kernel.
            d_last = store_ref[n - 1]
        else:
            # --- forward replay, storing pre-step depths in the VMEM
            #     scratch (ref stores: Mosaic lowers dynamic ref indexing,
            #     but not dynamic_update_slice on loop-carried values) ---
            d0 = rox * 0.0 + jnp.float32(cfg.near - 0.1)

            def fwd_body(i, depth):
                store_ref[i] = depth
                return depth + sdf.distance(ro + rd * depth)

            d_last = jax.lax.fori_loop(0, n - 1, fwd_body, d0)

        # --- final step (+ shading) pullback ---
        if want_color:
            def final_fn(sdf, rox, roy, roz, rdx, rdy, rdz, depth):
                _, rgb = _final_shade(
                    sdf, V3(rox, roy, roz), V3(rdx, rdy, rdz), depth, cfg
                )
                return rgb.x, rgb.y, rgb.z

            ct = (g_ref[0], g_ref[1], g_ref[2])
        else:
            def final_fn(sdf, rox, roy, roz, rdx, rdy, rdz, depth):
                ro = V3(rox, roy, roz)
                rd = V3(rdx, rdy, rdz)
                return depth + sdf.distance(ro + rd * depth)

            ct = g_ref[...]
        _, fvjp = jax.vjp(final_fn, sdf, rox, roy, roz, rdx, rdy, rdz, d_last)
        g_sdf, g_rox, g_roy, g_roz, g_rdx, g_rdy, g_rdz, g_depth = fvjp(ct)

        # --- reverse sweep over the march, one single-eval vjp per step ---
        def step_fn(sdf, rox, roy, roz, rdx, rdy, rdz, depth):
            ro = V3(rox, roy, roz)
            rd = V3(rdx, rdy, rdz)
            return depth + sdf.distance(ro + rd * depth)

        def bwd_body(k, carry):
            g_depth, g_sdf, g_rox, g_roy, g_roz, g_rdx, g_rdy, g_rdz = carry
            i = n - 2 - k
            d_i = store_ref[i]
            _, svjp = jax.vjp(step_fn, sdf, rox, roy, roz, rdx, rdy, rdz, d_i)
            gs, grx, gry, grz, gdx, gdy, gdz, g_depth = svjp(g_depth)
            g_sdf = jax.tree_util.tree_map(jnp.add, g_sdf, gs)
            return (g_depth, g_sdf, g_rox + grx, g_roy + gry, g_roz + grz,
                    g_rdx + gdx, g_rdy + gdy, g_rdz + gdz)

        carry = (g_depth, g_sdf, g_rox, g_roy, g_roz, g_rdx, g_rdy, g_rdz)
        carry = jax.lax.fori_loop(0, n - 1, bwd_body, carry)
        _, g_sdf, g_rox, g_roy, g_roz, g_rdx, g_rdy, g_rdz = carry

        # --- ray-generation pullback to the view scalars ---
        g_ivp16, g_cam3 = rays_vjp((g_rox, g_roy, g_roz, g_rdx, g_rdy, g_rdz))

        # --- accumulate scalar gradients across grid steps (sequential).
        #     Small trees: per-scalar SMEM read-modify-write. Big (VMEM-
        #     param) trees: assemble one (1, n_out) vector and accumulate it
        #     with a single vector add per grid step. ---
        if small_params:
            @pl.when(pl.program_id(0) == 0)
            def _():
                for j in range(n_out):
                    out_ref[0, j] = 0.0

            j = 0
            for leaf in jax.tree_util.tree_leaves(g_sdf):
                flat = jnp.reshape(leaf, (-1,))
                for t in range(flat.shape[0]):
                    out_ref[0, j] += flat[t]
                    j += 1
            for k in range(16):
                out_ref[0, j] += g_ivp16[k]
                j += 1
            for k in range(3):
                out_ref[0, j] += g_cam3[k]
                j += 1
        else:
            vals = []
            for leaf in jax.tree_util.tree_leaves(g_sdf):
                flat = jnp.reshape(leaf, (-1,))
                vals.extend(flat[t] for t in range(flat.shape[0]))
            vals.extend(g_ivp16[k] for k in range(16))
            vals.extend(g_cam3[k] for k in range(3))
            vec = jnp.stack(vals).reshape(1, n_out)
            first = pl.program_id(0) == 0

            @pl.when(first)
            def _():
                out_ref[...] = vec

            @pl.when(jnp.logical_not(first))
            def _():
                out_ref[...] = out_ref[...] + vec

    if want_color:
        g_spec = pl.BlockSpec(
            (3, br, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
    else:
        g_spec = pl.BlockSpec(
            (br, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    in_specs = (
        _param_specs(params_smem, shapes)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [g_spec]
    )
    args = [*params_smem, ivp, cam, pix0, g_packed]
    scratch = []
    if store is not None:
        in_specs.append(
            pl.BlockSpec(
                (n, br, 128), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(store)
    else:
        scratch.append(
            pltpu.VMEM((max(n - 1, 1), br, 128), jnp.float32)
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, n_out), lambda i: (0, 0),
            memory_space=pltpu.SMEM if small_params else pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((1, n_out), jnp.float32),
        scratch_shapes=scratch,
        interpret=jax.default_backend() == "cpu",
    )(*args)


def _pack_cotangent(g, cfg, want_color, npix=None, rows=None):
    """(H, W[, 3]) cotangent -> the padded tile layout of the bwd kernel.
    Padding lanes get zero cotangent, so the duplicated marches the forward
    kernel runs there contribute nothing. ``npix`` overrides the pixel count
    for row-band (shard) cotangents; ``rows`` forces the padded row extent
    (used to match a forward depth store's layout)."""
    if npix is None:
        npix = cfg.width * cfg.height
    if rows is not None:
        padded = rows * 128
    else:
        tile = BWD_BLOCK_ROWS * 128
        padded = ((npix + tile - 1) // tile) * tile
    if want_color:
        flat = jnp.stack(
            [jnp.ravel(g[..., 0]), jnp.ravel(g[..., 1]), jnp.ravel(g[..., 2])]
        )
        flat = jnp.pad(flat, ((0, 0), (0, padded - npix)))
        return flat.reshape(3, padded // 128, 128)
    flat = jnp.pad(jnp.ravel(g), (0, padded - npix))
    return flat.reshape(padded // 128, 128)


def _view_to_ivp_cam(view, cfg):
    """The host-side prep the forward does: view -> (ivp (1,16), cam (1,3))."""
    from sdfkit_tpu.utils import camera as cam_mod

    view = jnp.asarray(view, jnp.float32)
    cam_tf = jnp.linalg.inv(view)
    cam_pos = cam_tf[3, :3].reshape(1, 3)
    proj = cam_mod.perspective_fov(
        jnp.deg2rad(jnp.float32(cfg.vfov_degrees)),
        cfg.width / cfg.height,
        cfg.near,
        cfg.far,
    )
    ivp = jnp.linalg.inv(view @ proj).reshape(1, 16)
    return ivp, cam_pos


def _image_fused_fwd(sdf, view, cfg, want_color):
    out = _render_image_fused_impl(sdf, view, cfg, want_color)
    return out, (sdf, view)


def _image_fused_bwd(cfg, want_color, residuals, g):
    """Backward = the Pallas pullback kernel above; only the 4x4 view-matrix
    algebra (ivp/cam prep) is pulled back on the host."""
    sdf, view = residuals
    params, treedef, shapes = _flatten_params(sdf)
    (ivp, cam), prep_vjp = jax.vjp(
        lambda v: _view_to_ivp_cam(v, cfg), jnp.asarray(view, jnp.float32)
    )
    g_packed = _pack_cotangent(jnp.asarray(g, jnp.float32), cfg, want_color)
    out = _pallas_render_image_bwd(
        params, ivp, cam, jnp.zeros((1, 1), jnp.int32), g_packed, None,
        (treedef, tuple(shapes)), cfg, want_color, cfg.width * cfg.height
    )[0]

    # Unpack the flat scalar cotangents back into the sdf pytree and view.
    leaves = []
    pos = 0
    for s in shapes:
        k = int(np.prod(s)) if s else 1
        chunk = out[pos : pos + k]
        leaves.append(chunk.reshape(s) if s else chunk[0])
        pos += k
    g_sdf = jax.tree_util.tree_unflatten(treedef, leaves)
    g_ivp = out[pos : pos + 16].reshape(1, 16)
    g_cam = out[pos + 16 : pos + 19].reshape(1, 3)
    (g_view,) = prep_vjp((g_ivp, g_cam))
    return g_sdf, g_view


_render_image_fused_impl.defvjp(_image_fused_fwd, _image_fused_bwd)


def render_image_fused(sdf, view, cfg):
    """Fully fused (H, W, 3) render: rays generated in-kernel from `view`."""
    return _render_image_fused_impl(sdf, view, cfg, True)


def render_depth_image_fused(sdf, view, cfg):
    """Fully fused (H, W) depth render."""
    return _render_image_fused_impl(sdf, view, cfg, False)


# ---------------------------------------------------------------------------
# Row-band fused render: the shard_map entry point. Each device renders
# ``n_rows`` rows of the global image, offset by a TRACED flat-pixel index
# (axis_index * n_rows * width) — one compiled kernel serves every shard.
# This is the multi-chip analogue of the reference's row-band Parallel.For
# (RayMarcher.cs:50-61), with the fused kernel as the per-band worker.
# Differentiable: backward is the Pallas pullback kernel per band; the
# replicated sdf cotangents are psum'd by shard_map's replicated out-spec.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _render_rows_fused_impl(sdf, ivp, cam, pix0, cfg, n_rows, want_color):
    params, treedef, shapes = _flatten_params(sdf)
    local_npix = n_rows * cfg.width
    pix0 = jnp.asarray(pix0, jnp.int32).reshape(1, 1)
    results = _pallas_render_image_flat(
        params, ivp, cam, pix0, (treedef, tuple(shapes)), cfg, want_color,
        local_npix,
    )
    if not want_color:
        return results[0].reshape(-1)[:local_npix].reshape(n_rows, cfg.width)
    rgb = results[0].reshape(3, -1)[:, :local_npix]
    return jnp.stack([c.reshape(n_rows, cfg.width) for c in rgb], axis=-1)


def _rows_fused_fwd(sdf, ivp, cam, pix0, cfg, n_rows, want_color):
    out = _render_rows_fused_impl(sdf, ivp, cam, pix0, cfg, n_rows,
                                  want_color)
    return out, (sdf, ivp, cam, pix0)


def _rows_fused_bwd(cfg, n_rows, want_color, residuals, g):
    sdf, ivp, cam, pix0 = residuals
    params, treedef, shapes = _flatten_params(sdf)
    local_npix = n_rows * cfg.width
    g_packed = _pack_cotangent(
        jnp.asarray(g, jnp.float32), cfg, want_color, npix=local_npix
    )
    out = _pallas_render_image_bwd(
        params, ivp, cam, jnp.asarray(pix0, jnp.int32).reshape(1, 1),
        g_packed, None, (treedef, tuple(shapes)), cfg, want_color,
        local_npix,
    )[0]
    leaves = []
    pos = 0
    for s in shapes:
        k = int(np.prod(s)) if s else 1
        chunk = out[pos : pos + k]
        leaves.append(chunk.reshape(s) if s else chunk[0])
        pos += k
    g_sdf = jax.tree_util.tree_unflatten(treedef, leaves)
    g_ivp = out[pos : pos + 16].reshape(1, 16)
    g_cam = out[pos + 16 : pos + 19].reshape(1, 3)
    # pix0 is integer-valued: its cotangent is the symbolic float0 zero.
    g_pix0 = np.zeros(np.shape(pix0), jax.dtypes.float0)
    return g_sdf, g_ivp, g_cam, g_pix0


_render_rows_fused_impl.defvjp(_rows_fused_fwd, _rows_fused_bwd)


def render_rows_fused(sdf, ivp, cam, pix0, cfg, n_rows):
    """Fused render of ``n_rows`` rows starting at flat pixel ``pix0``
    (traced OK) of the cfg.width x cfg.height image. ``ivp``/``cam`` come
    from _view_to_ivp_cam(view, cfg). Returns (n_rows, W, 3)."""
    return _render_rows_fused_impl(sdf, ivp, cam, pix0, cfg, n_rows, True)


def render_depth_rows_fused(sdf, ivp, cam, pix0, cfg, n_rows):
    """Depth variant of render_rows_fused: (n_rows, W)."""
    return _render_rows_fused_impl(sdf, ivp, cam, pix0, cfg, n_rows, False)


def _fused_fwd(sdf, ro, rd, cfg, want_color):
    out = _render_fused_impl(sdf, ro, rd, cfg, want_color)
    return out, (sdf, ro, rd)


def _fused_bwd(cfg, want_color, residuals, g):
    """Backward = autodiff through the (rematerialized) jnp path, which is
    the same math; the fused kernel is used only for the primal."""
    sdf, ro, rd = residuals
    if want_color:
        fn = lambda s, o, d: rm.render_rays(s, o, d, cfg)
    else:
        fn = lambda s, o, d: rm.render_depth_rays(s, o, d, cfg)
    _, vjp = jax.vjp(fn, sdf, ro, rd)
    return vjp(g)


_render_fused_impl.defvjp(_fused_fwd, _fused_bwd)
