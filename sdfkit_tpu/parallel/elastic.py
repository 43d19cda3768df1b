"""Restartable (fault-tolerant) rendering: SURVEY §5's failure-detection /
elastic-recovery plan — "multi-host render jobs are restartable from the
voxel/ray-tile level".

The reference has nothing here (a crashed render is simply lost); large
multi-chip frames make restartability worth having: the frame renders in row
TILES, every finished tile is persisted atomically (tmp + rename, one .npy
per tile plus a manifest), and a re-run of the same job resumes from the
surviving tiles — bit-identical to an uninterrupted run, because each tile is
rendered by exactly the same per-tile program either way. Works single-chip
or with each tile's rows sharded over a device mesh.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from sdfkit_tpu.render.raymarch import RenderConfig, render_rays
from sdfkit_tpu.utils.camera import camera_rays, default_view


def _scene_fingerprint(sdf) -> str:
    """Stable hash of the SDF's tree structure and parameter values."""
    import hashlib

    h = hashlib.sha256()
    h.update(repr(jax.tree_util.tree_structure(sdf)).encode())
    for leaf in jax.tree_util.tree_leaves(sdf):
        a = np.asarray(leaf)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()


def render_tiles_resumable(
    sdf,
    width: int,
    height: int,
    checkpoint_dir,
    tile_rows: int = 128,
    view=None,
    mesh=None,
    progress=None,
    **cfg_kwargs,
):
    """Render an (H, W, 3) image in resumable row tiles.

    Every completed tile is written to ``checkpoint_dir`` before the next
    starts; rerunning after a crash (or on another host) skips finished
    tiles. Returns ``(image, stats)`` where stats counts resumed vs rendered
    tiles. Pass ``mesh`` to shard each tile's rows over a device mesh (the
    same zero-communication row decomposition as render_sharded).
    """
    cfg = RenderConfig(width=width, height=height, **cfg_kwargs)
    view = default_view() if view is None else jnp.asarray(view, jnp.float32)
    os.makedirs(checkpoint_dir, exist_ok=True)

    manifest_path = os.path.join(checkpoint_dir, "manifest.json")
    manifest = {
        "width": width,
        "height": height,
        "tile_rows": tile_rows,
        "view": np.asarray(view).tolist(),
        # Tiles are only reusable for the SAME scene and render settings:
        # fingerprint the SDF (tree structure + parameter bytes) and the
        # full RenderConfig so a resumed run with a different job is
        # rejected instead of silently mixing stale tiles into the frame.
        "scene": _scene_fingerprint(sdf),
        "config": repr(cfg),
    }
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            existing = json.load(f)
        if existing != manifest:
            raise ValueError(
                f"checkpoint_dir {checkpoint_dir} holds tiles of a different "
                f"job (manifest mismatch); use a fresh directory"
            )
    else:
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, manifest_path)

    # Rays for the full frame once; each tile slices its rows, so tile
    # boundaries never change the ray math.
    ro, rd = camera_rays(
        width, height, view, cfg.vfov_degrees, cfg.near, cfg.far
    )

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from sdfkit_tpu.parallel.train import _pad_rows, shard_rays

        axis = mesh.axis_names[0]
        # One jitted program shared by every tile (full tiles have one
        # shape, the tail tile at most one more) — building the wrapper
        # inside the loop would retrace/recompile per tile.
        local = lambda sdf, ro, rd: render_rays(sdf, ro, rd, cfg)
        shmapped = jax.jit(
            jax.shard_map(
                local, mesh=mesh,
                in_specs=(P(), P(axis), P(axis)),
                out_specs=P(axis),
            )
        )

        def render_tile(ro_t, rd_t):
            (ro_p, orig), (rd_p, _) = (
                _pad_rows(ro_t, mesh.devices.size),
                _pad_rows(rd_t, mesh.devices.size),
            )
            ro_p, rd_p = shard_rays(mesh, ro_p, rd_p)
            return shmapped(sdf, ro_p, rd_p)[:orig]

    else:

        @jax.jit
        def render_tile(ro_t, rd_t):
            return render_rays(sdf, ro_t, rd_t, cfg)

    n_tiles = -(-height // tile_rows)
    tiles = []
    resumed = rendered = 0
    for t in range(n_tiles):
        path = os.path.join(checkpoint_dir, f"tile_{t:05d}.npy")
        if os.path.exists(path):
            tiles.append(np.load(path))
            resumed += 1
        else:
            r0 = t * tile_rows
            r1 = min(height, r0 + tile_rows)
            sl = lambda a: a[r0:r1]
            tile = np.asarray(
                render_tile(
                    jax.tree_util.tree_map(sl, ro),
                    jax.tree_util.tree_map(sl, rd),
                )
            )
            tmp = path + ".tmp.npy"
            np.save(tmp, tile)
            os.replace(tmp, path)  # atomic: a crash never leaves half a tile
            tiles.append(tile)
            rendered += 1
        if progress is not None:
            progress(t + 1, n_tiles)

    image = np.concatenate(tiles, axis=0)
    return image, {"resumed": resumed, "rendered": rendered,
                   "tiles": n_tiles}
