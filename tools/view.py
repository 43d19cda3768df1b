"""Scene viewer CLI — the analogue of the reference's Perf.WindowsForms
interactive viewer (reference: Perf.WindowsForms/MainForm.cs), headless:
renders a scene to PNG (or TGA), optionally as an orbit turntable sequence.

Usage:
    python tools/view.py [--scene sphere_repeat] [--size 960x540]
                         [--out /tmp/view.png] [--orbit N]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def scenes():
    import sdfkit_tpu as sk
    from bench import sphere_repeat_scene

    return {
        "sphere_repeat": sphere_repeat_scene,
        "sphere": lambda: sk.sphere(1.0, color=(0.9, 0.4, 0.2)),
        "csg": lambda: sk.sphere(1.0, color=(0.9, 0.3, 0.2)).smooth_union(
            sk.box(0.8, color=(0.2, 0.5, 0.9)).translate(1.0, 0, 0), 0.3
        ),
        "torus": lambda: sk.torus(1.0, 0.35, color=(0.4, 0.8, 0.5)).rotate_x(0.7),
    }


def save(path, img: np.ndarray) -> None:
    if path.endswith(".tga"):
        from sdfkit_tpu.io.tga import write_tga

        write_tga(path, img)
        return
    from PIL import Image

    rgb = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(rgb).save(path)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="sphere_repeat", choices=sorted(scenes()))
    ap.add_argument("--size", default="960x540")
    ap.add_argument("--out", default="/tmp/sdfkit_view.png")
    ap.add_argument("--orbit", type=int, default=0, metavar="N",
                    help="render N frames orbiting the origin (out gets -000 suffixes)")
    ap.add_argument("--distance", type=float, default=5.0)
    args = ap.parse_args()

    import sdfkit_tpu as sk

    w, h = (int(v) for v in args.size.split("x"))
    scene = scenes()[args.scene]()

    if args.orbit <= 0:
        img = np.asarray(sk.render(scene, w, h, camera_position=(-2, 2, 4)))
        save(args.out, img)
        print(args.out)
        return 0

    root, ext = os.path.splitext(args.out)
    marcher = sk.RayMarcher(w, h, scene)
    for i in range(args.orbit):
        a = 2.0 * math.pi * i / args.orbit
        view = sk.look_at(
            (args.distance * math.sin(a), 2.0, args.distance * math.cos(a)),
            (0, 0, 0),
            (0, 1, 0),
        )
        frame = np.asarray(marcher.render(camera=view))
        path = f"{root}-{i:03d}{ext}"
        save(path, frame)
        print(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
