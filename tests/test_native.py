"""The C++ host kernels (sdfkit_tpu/native/sparse_phase.cc) vs their numpy
references. Welding must be BITWISE identical (it decides vertex identity and
ordering, hence golden vertex counts); gradient accumulation must agree to
float tolerance (the C++ single pass and numpy's multiplicity-compressed
passes round differently at the ulp level)."""

import os

import numpy as np
import pytest

from sdfkit_tpu import native
from sdfkit_tpu.mesh import luts
from sdfkit_tpu.mesh.marching_cubes import FLT_EPSILON, _corner_gradients

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def numpy_weld(keys):
    uniq, first_idx, inv = np.unique(
        keys, return_index=True, return_inverse=True
    )
    order = np.argsort(first_idx, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(order.size)
    return rank[inv], first_idx[order]


class TestWeld:
    def test_matches_numpy_random(self):
        rng = np.random.default_rng(0)
        keys = rng.integers(0, 5000, 200_000).astype(np.int64)
        vid_c, rep_c = native.weld(keys)
        vid_np, rep_np = numpy_weld(keys)
        np.testing.assert_array_equal(vid_c, vid_np)
        np.testing.assert_array_equal(rep_c, rep_np)

    def test_matches_numpy_edge_cases(self):
        for keys in (
            np.array([7], np.int64),
            np.array([3, 3, 3], np.int64),
            np.array([5, 1, 5, 1, 2], np.int64),
            np.arange(100, dtype=np.int64)[::-1].copy(),
        ):
            vid_c, rep_c = native.weld(keys)
            vid_np, rep_np = numpy_weld(keys)
            np.testing.assert_array_equal(vid_c, vid_np)
            np.testing.assert_array_equal(rep_c, rep_np)


class TestGradEdges:
    def test_matches_numpy_per_entry(self):
        rng = np.random.default_rng(1)
        m, n, n_verts = 500, 20_000, 700
        v8 = rng.normal(size=(8, m))
        vg = _corner_gradients(v8)
        evi = rng.integers(0, 12, n).astype(np.uint8)
        ecell = rng.integers(0, m, n).astype(np.int64)
        vid = rng.integers(0, n_verts, n).astype(np.int64)

        normals_c = np.zeros((n_verts, 3), np.float32)
        native.grad_edges(evi, ecell, vid, v8, vg, normals_c, FLT_EPSILON)

        # Per-entry numpy reference (no multiplicity compression).
        p1 = luts.EDGE_P1[evi]
        p2 = luts.EDGE_P2[evi]
        va = v8[luts.EDGE_MC1[evi], ecell]
        vb = v8[luts.EDGE_MC2[evi], ecell]
        t1 = (1.0 / (FLT_EPSILON + np.abs(va))).astype(np.float32)
        t2 = (1.0 / (FLT_EPSILON + np.abs(vb))).astype(np.float32)
        contrib = vg[p1, ecell] * t1[:, None] + vg[p2, ecell] * t2[:, None]
        normals_np = np.zeros((n_verts, 3), np.float32)
        np.add.at(normals_np, vid, contrib)

        np.testing.assert_allclose(normals_c, normals_np, rtol=1e-5, atol=1e-4)


def test_mesh_native_vs_numpy_path():
    """End to end on the SAME voxels: to_mesh with the C++ kernels vs the
    numpy fallback (SDFKIT_TPU_NO_NATIVE=1). Vertex identity, order, counts,
    positions and colors identical (welding is bitwise-equal and everything
    downstream of it is shared code); normals allclose (the C++ single pass
    and numpy's multiplicity-compressed accumulation round differently)."""
    import sdfkit_tpu as sk

    v = sk.voxelize(sk.sphere(0.5), (-1.0,) * 3, (1.0,) * 3, 32, 32, 32)
    m = v.to_mesh()
    assert len(m.vertices) == 1248  # golden via the native path

    os.environ["SDFKIT_TPU_NO_NATIVE"] = "1"
    try:
        m_np = v.to_mesh()
    finally:
        del os.environ["SDFKIT_TPU_NO_NATIVE"]
    np.testing.assert_array_equal(m.vertices, m_np.vertices)
    np.testing.assert_array_equal(m.triangles, m_np.triangles)
    np.testing.assert_array_equal(m.colors, m_np.colors)
    np.testing.assert_allclose(m.normals, m_np.normals, atol=1e-4)
