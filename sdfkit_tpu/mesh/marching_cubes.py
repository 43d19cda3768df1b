"""Lewiner MC33 marching cubes — placeholder, implemented in the next slice.

Reference: SdfKit/MarchingCubes.cs + Cell.cs + Luts.cs (ported there from
scikit-image's _marching_cubes_lewiner_cy.pyx).
"""

from __future__ import annotations


def create_mesh(voxels, iso_value: float = 0.0, step: int = 1, progress=None):
    raise NotImplementedError("marching cubes lands in the next milestone")
