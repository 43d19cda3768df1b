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

# Rows of 128 lanes per grid step. 512x128 f32 = 256 KB per array; 6 ray
# inputs + 4 outputs + intermediates stay well under the 16 MB VMEM budget.
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
