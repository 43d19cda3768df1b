"""Benchmark harness — the TPU analogue of the reference Perf console
(reference: Perf/Program.cs): renders the SphereRepeat scene (Union of
RepeatXY spheres and RepeatXZ boxes with per-cell color, Program.cs:5-41) at
1920x1080 with 40 depth iterations, 3 timed loops after a warmup loop
(Program.cs:43-65), and reports Mrays/s = width*height / seconds.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
vs_baseline is measured against the BASELINE.json north-star target of
100 Mrays/s/chip (the reference publishes no numbers of its own).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

import sdfkit_tpu as sk
from sdfkit_tpu.utils.v3 import V3

TARGET_MRAYS_PER_SEC = 100.0  # BASELINE.json north star, per chip
WIDTH, HEIGHT = 1920, 1080
LOOPS = 3


def sphere_repeat_scene() -> sk.SdfExpr:
    """The Perf scene (Perf/Program.cs:5-22): Union of
    RepeatXY spheres and RepeatXZ boxes, per-cell color 0.9 - |i|/6."""
    r = 0.5

    def cell_color(i, p, c, d):
        return V3(
            0.9 - jnp.abs(i.x) / 6.0,
            0.9 - jnp.abs(i.y) / 6.0,
            0.9 - jnp.abs(i.z) / 6.0,
        )

    spheres = sk.sphere(r).repeat_xy(2.25 * r, 2.25 * r, cell_color)
    boxes = sk.box(r / 2).repeat_xz(3.0 * r, 3.0 * r, cell_color)
    return spheres | boxes


def _timed(fn, *args) -> float:
    """Median wall-clock seconds for fn. The jitted fn must return a scalar
    which is fetched to host — under the axon tunnel, block_until_ready
    returns before device compute finishes, so a host fetch of a reduced
    scalar is the only honest sync (keeps the 25MB image off the slow
    tunnel)."""
    float(fn(*args))  # warmup / compile, excluded as in Perf/Program.cs:48-52
    times = []
    for _ in range(LOOPS):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def bench_render() -> dict:
    from sdfkit_tpu.render.raymarch import RenderConfig, render_rays
    from sdfkit_tpu.utils.camera import camera_rays

    scene = sphere_repeat_scene()
    view = sk.look_at((-2.0, 2.0, 4.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))
    cfg = RenderConfig(width=WIDTH, height=HEIGHT)

    @jax.jit
    def render_sum(scene, view):
        ro, rd = camera_rays(
            cfg.width, cfg.height, view, cfg.vfov_degrees, cfg.near, cfg.far
        )
        return jnp.sum(render_rays(scene, ro, rd, cfg))

    seconds = _timed(render_sum, scene, view)
    mrays = WIDTH * HEIGHT / seconds / 1e6
    return {
        "metric": "sphere_repeat_render_1920x1080",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / TARGET_MRAYS_PER_SEC, 4),
        "extra": {
            "render_ms": round(seconds * 1e3, 2),
            "device": str(jax.devices()[0]),
        },
    }


def bench_voxels(n: int = 256) -> dict:
    scene = sphere_repeat_scene()

    @jax.jit
    def voxel_sum(scene):
        v = sk.voxelize(scene, (-2, -2, -2), (2, 2, 2), n, n, n)
        return jnp.sum(v.values)

    seconds = _timed(voxel_sum, scene)
    return {
        "metric": f"voxel_samples_{n}^3",
        "value": round(n**3 / seconds / 1e6, 3),
        "unit": "Msamples/s",
        "seconds": round(seconds, 4),
    }


def main():
    result = bench_render()
    vox = bench_voxels()
    result["extra"]["voxel_Msamples_per_s"] = vox["value"]
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
