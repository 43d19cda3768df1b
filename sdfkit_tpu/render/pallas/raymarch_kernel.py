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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdfkit_tpu.render import raymarch as rm
from sdfkit_tpu.utils.v3 import V3

# Rows of 128 lanes per grid step. 512x128 f32 = 256 KB per array; outputs
# plus march intermediates stay inside the 16 MB scoped-VMEM budget. Swept on
# v5e at 1080p: 1024 rows -> 2.19 ms but OOMs scoped VMEM on the RGB path
# once chained, 256 -> 2.22 ms, 512 -> 2.24 ms; 512 is chosen because the
# 0.02 ms spread is within run-to-run jitter and 512 leaves the most
# pipelining headroom for heavier scenes.
BLOCK_ROWS = 512


def _march_and_shade(sdf, ro: V3, rd: V3, cfg: rm.RenderConfig, want_color: bool):
    """The per-tile computation (identical math to render/raymarch.py)."""
    depth = ro.x * 0.0 + jnp.float32(cfg.near - 0.1)

    def body(_, depth):
        pos = ro + rd * depth
        return depth + sdf.distance(pos)

    n = cfg.depth_iterations
    if not want_color:
        return jax.lax.fori_loop(0, n, body, depth), None

    depth = jax.lax.fori_loop(0, n - 1, body, depth)
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


def _flatten_params(sdf):
    """Pytree leaves -> SMEM-shaped (1, size) f32 arrays + rebuild info."""
    leaves, treedef = jax.tree_util.tree_flatten(sdf)
    shapes = [jnp.shape(l) for l in leaves]
    smem = [jnp.asarray(l, jnp.float32).reshape(1, -1) for l in leaves]
    return smem, treedef, shapes


def _rebuild(treedef, shapes, refs):
    """SMEM permits only scalar loads; reassemble each leaf from scalars."""
    leaves = []
    for i, shp in enumerate(shapes):
        k = 1
        for d in shp:
            k *= d
        vals = [refs[i][0, j] for j in range(k)]
        if shp == ():
            leaves.append(vals[0])
        else:
            leaves.append(jnp.stack(vals).reshape(shp))
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
        out_refs[0][...] = depth
        if want_color:
            out_refs[1][0] = color.x
            out_refs[1][1] = color.y
            out_refs[1][2] = color.z

    ray_spec = pl.BlockSpec(
        (3, BLOCK_ROWS, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    depth_spec = pl.BlockSpec(
        (BLOCK_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = [jax.ShapeDtypeStruct((rows, 128), jnp.float32)]
    out_specs = [depth_spec]
    if want_color:
        out_shape.append(jax.ShapeDtypeStruct((3, rows, 128), jnp.float32))
        out_specs.append(ray_spec)

    results = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * n_leaves
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
    rgb = results[1].reshape(3, -1)[:, :n]
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


def _rays_from_index(ivp_ref, cam_ref, width: int, height: int):
    """Per-lane ray origin/direction from the flat pixel index.

    Identical math to utils/camera.camera_rays: NDC uses /(width-1) and
    /(height-1) denominators, y flipped so row 0 is the image top.
    """
    npix = width * height
    pid = pl.program_id(0)
    row = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, 128), 1)
    idx = (pid * BLOCK_ROWS + row) * 128 + lane
    # Clamp padding lanes onto the last real pixel so their (discarded)
    # marches stay finite.
    idx = jnp.minimum(idx, npix - 1)
    py = idx // width
    px = idx - py * width
    xf = -1.0 + 2.0 * px.astype(jnp.float32) / max(width - 1, 1)
    yf = 1.0 - 2.0 * py.astype(jnp.float32) / max(height - 1, 1)

    m = [ivp_ref[0, k] for k in range(16)]  # inverse(view @ proj), row-major
    hx = xf * m[0] + yf * m[4] + m[12]
    hy = xf * m[1] + yf * m[5] + m[13]
    hz = xf * m[2] + yf * m[6] + m[14]
    hw = xf * m[3] + yf * m[7] + m[15]
    pos = V3(hx / hw, hy / hw, hz / hw)
    ro = V3(
        jnp.broadcast_to(cam_ref[0, 0], (BLOCK_ROWS, 128)),
        jnp.broadcast_to(cam_ref[0, 1], (BLOCK_ROWS, 128)),
        jnp.broadcast_to(cam_ref[0, 2], (BLOCK_ROWS, 128)),
    )
    rd = (pos - ro).normalize()
    return ro, rd


@partial(jax.jit, static_argnums=(3, 4, 5))
def _pallas_render_image_flat(params_smem, ivp, cam, meta, cfg, want_color):
    """ivp: (1, 16) inverse(view@proj); cam: (1, 3) camera position."""
    treedef, shapes = meta
    n_leaves = len(params_smem)
    npix = cfg.width * cfg.height
    tile = BLOCK_ROWS * 128
    rows = ((npix + tile - 1) // tile) * BLOCK_ROWS
    grid = (rows // BLOCK_ROWS,)

    def kernel(*refs):
        leaf_refs = refs[:n_leaves]
        ivp_ref, cam_ref = refs[n_leaves], refs[n_leaves + 1]
        out_refs = refs[n_leaves + 2 :]
        sdf = _rebuild(treedef, shapes, leaf_refs)
        ro, rd = _rays_from_index(ivp_ref, cam_ref, cfg.width, cfg.height)
        depth, color = _march_and_shade(sdf, ro, rd, cfg, want_color)
        out_refs[0][...] = depth
        if want_color:
            out_refs[1][0] = color.x
            out_refs[1][1] = color.y
            out_refs[1][2] = color.z

    depth_spec = pl.BlockSpec(
        (BLOCK_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    rgb_spec = pl.BlockSpec(
        (3, BLOCK_ROWS, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    out_shape = [jax.ShapeDtypeStruct((rows, 128), jnp.float32)]
    out_specs = [depth_spec]
    if want_color:
        out_shape.append(jax.ShapeDtypeStruct((3, rows, 128), jnp.float32))
        out_specs.append(rgb_spec)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * (n_leaves + 2),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=jax.default_backend() == "cpu",
    )(*params_smem, ivp, cam)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _render_image_fused_impl(sdf, view, cfg, want_color):
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
    params, treedef, shapes = _flatten_params(sdf)
    results = _pallas_render_image_flat(
        params, ivp, cam_pos, (treedef, tuple(shapes)), cfg, want_color
    )
    npix = cfg.width * cfg.height
    depth = results[0].reshape(-1)[:npix].reshape(cfg.height, cfg.width)
    if not want_color:
        return depth
    rgb = results[1].reshape(3, -1)[:, :npix]
    return jnp.stack(
        [c.reshape(cfg.height, cfg.width) for c in rgb], axis=-1
    )


def _image_fused_fwd(sdf, view, cfg, want_color):
    out = _render_image_fused_impl(sdf, view, cfg, want_color)
    return out, (sdf, view)


def _image_fused_bwd(cfg, want_color, residuals, g):
    """Backward replays the jnp path (same math) under autodiff."""
    from sdfkit_tpu.utils.camera import camera_rays

    sdf, view = residuals

    def fn(s, v):
        ro, rd = camera_rays(
            cfg.width, cfg.height, v, cfg.vfov_degrees, cfg.near, cfg.far
        )
        if want_color:
            return rm.render_rays(s, ro, rd, cfg)
        return rm.render_depth_rays(s, ro, rd, cfg)

    _, vjp = jax.vjp(fn, sdf, view)
    return vjp(g)


_render_image_fused_impl.defvjp(_image_fused_fwd, _image_fused_bwd)


def render_image_fused(sdf, view, cfg):
    """Fully fused (H, W, 3) render: rays generated in-kernel from `view`."""
    return _render_image_fused_impl(sdf, view, cfg, True)


def render_depth_image_fused(sdf, view, cfg):
    """Fully fused (H, W) depth render."""
    return _render_image_fused_impl(sdf, view, cfg, False)


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
