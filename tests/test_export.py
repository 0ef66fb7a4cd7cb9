"""Mesh-export tests: native core vs numpy fallback on an analytic sphere,
PLY roundtrip, and the engine → mesh path."""

import numpy as np
import pytest

from nerf_kinematics_tpu.export.mesh import (
    _extract_mesh_numpy,
    _load_native,
    extract_mesh,
    load_ply,
    save_ply,
)


def _sphere_grid(n=32, r=0.3):
    lin = np.linspace(0, 1, n)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return r - np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)


def test_native_library_builds():
    assert _load_native() is not None, "native mesh core failed to build/load"


def test_sphere_surface_native():
    grid = _sphere_grid()
    verts, tris = extract_mesh(grid, iso=0.0)
    assert len(verts) > 1000 and len(tris) > 1000
    # All vertices lie on the r=0.3 sphere around (0.5, 0.5, 0.5).
    d = np.linalg.norm(verts - 0.5, axis=1)
    np.testing.assert_allclose(d, 0.3, atol=0.03)
    # Triangles index valid vertices.
    assert tris.min() >= 0 and tris.max() < len(verts)
    # Total area ≈ 4π r² (watertight surface).
    a, b, c = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
    np.testing.assert_allclose(area, 4 * np.pi * 0.3**2, rtol=0.05)


def test_numpy_fallback_matches_native_area():
    grid = _sphere_grid(24)
    b = np.asarray([0, 0, 0, 1, 1, 1], np.float32)
    v1, t1 = _extract_mesh_numpy(grid, 0.0, b)
    d = np.linalg.norm(v1 - 0.5, axis=1)
    np.testing.assert_allclose(d, 0.3, atol=0.04)
    if _load_native() is not None:
        v2, t2 = extract_mesh(grid, iso=0.0)
        a1 = _area(v1, t1)
        a2 = _area(v2, t2)
        np.testing.assert_allclose(a1, a2, rtol=1e-3)


def _area(verts, tris):
    a, b, c = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    return 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()


def test_bounds_mapping():
    grid = _sphere_grid(16)
    verts, _ = extract_mesh(grid, iso=0.0, bounds=(-2, -2, -2, 2, 2, 2))
    d = np.linalg.norm(verts - 0.0, axis=1)  # center now at origin
    np.testing.assert_allclose(d, 0.3 * 4, atol=0.2)


def test_ply_roundtrip(tmp_path):
    grid = _sphere_grid(16)
    verts, tris = extract_mesh(grid, iso=0.0)
    p = str(tmp_path / "m.ply")
    save_ply(p, verts, tris)
    v2, t2 = load_ply(p)
    np.testing.assert_allclose(v2, verts, rtol=1e-6)
    np.testing.assert_array_equal(t2, tris)


def test_engine_to_mesh(tmp_path):
    """NGP engine density grid → mesh (density starts near-uniform, so use a
    threshold below the init density to get a surface at the box edge —
    mostly checks plumbing end to end)."""
    from nerf_kinematics_tpu.export.mesh import extract_mesh_from_engine
    from nerf_kinematics_tpu.models.ngp import NGPConfig
    from nerf_kinematics_tpu.ops.cp_grid import CPGridConfig
    from nerf_kinematics_tpu.train.config import Config
    from nerf_kinematics_tpu.train.ngp_engine import NGPEngine

    cfg = Config(
        engine="ngp",
        ngp=NGPConfig(
            encoder="cp",
            cp=CPGridConfig(n_levels=2, n_components=4, base_resolution=8,
                            max_resolution=16, table_size=16),
            density_width=16, density_layers=2, color_width=16, color_layers=2,
        ),
    )
    engine = NGPEngine(cfg, scene_bound=1.0)
    state = engine.init_state(0)
    path = str(tmp_path / "scene.ply")
    grid = np.asarray(engine.density_grid(state.params, resolution=16))
    iso = float(np.median(grid))
    verts, tris = extract_mesh(grid, iso=iso, bounds=(-1, -1, -1, 1, 1, 1))
    save_ply(path, verts, tris)
    import os

    assert os.path.getsize(path) > 100


def test_density_grid_axis_order(monkeypatch):
    """density_grid must store sigma(x, y, z) at grid[ix, iy, iz] — the
    layout both mesh extractors assume ((x*ny + y)*nz + z). Regression for
    the x/z transposition: a density that varies only along world x must
    vary only along axis 0 of the returned volume."""
    from nerf_kinematics_tpu.models.ngp import NGPConfig, NGPModel
    from nerf_kinematics_tpu.ops.cp_grid import CPGridConfig
    from nerf_kinematics_tpu.train.config import Config
    from nerf_kinematics_tpu.train.ngp_engine import NGPEngine

    cfg = Config(
        engine="ngp",
        ngp=NGPConfig(
            encoder="cp",
            cp=CPGridConfig(n_levels=2, n_components=4, base_resolution=8,
                            max_resolution=16, table_size=16),
            density_width=16, density_layers=2, color_width=16, color_layers=2,
        ),
    )
    engine = NGPEngine(cfg, scene_bound=1.0)
    state = engine.init_state(0)
    # Density = the unit-cube x coordinate (engine maps world->unit first).
    monkeypatch.setattr(NGPModel, "density", lambda self, xyz: (xyz[..., 0], None))
    grid = np.asarray(engine.density_grid(state.params, resolution=8))
    lin01 = np.linspace(0.0, 1.0, 8)  # unit-cube x of the queried lattice
    np.testing.assert_allclose(grid, lin01[:, None, None] * np.ones((8, 8, 8)),
                               atol=1e-6)


def test_asymmetric_blob_mesh_position():
    """End-to-end axis check the sphere goldens cannot see: a blob centered
    at world (+0.6, 0, -0.2) must produce mesh vertices centered there."""
    lin = np.linspace(-1, 1, 32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    grid = 0.25 - np.sqrt((x - 0.6) ** 2 + y**2 + (z + 0.2) ** 2)
    verts, tris = extract_mesh(grid, iso=0.0, bounds=(-1, -1, -1, 1, 1, 1))
    assert len(verts) > 100
    np.testing.assert_allclose(verts.mean(0), [0.6, 0.0, -0.2], atol=0.02)


def test_welded_indexed_mesh_no_duplicates():
    """VERDICT r4 #4 regression: both extractors emit an INDEXED mesh with
    globally welded edge-vertices — no duplicate positions, the closed-mesh
    Euler ratio V ≈ T/2 (the reference's marching_cubes.cu emits the same
    shared-vertex structure: cell 28, 2.70M verts / 5.17M tris), and every
    edge shared by exactly two triangles (crack-free across cell/slab
    boundaries)."""
    lin = np.linspace(-1, 1, 32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    grid = 0.25 - np.sqrt((x - 0.6) ** 2 + y**2 + (z + 0.2) ** 2)
    b = np.asarray([-1, -1, -1, 1, 1, 1], np.float32)
    paths = [lambda g: _extract_mesh_numpy(g, 0.0, b)]
    if _load_native() is not None:
        paths.append(lambda g: extract_mesh(g, iso=0.0, bounds=tuple(b)))
    for extract in paths:
        verts, tris = extract(grid)
        assert len(verts) > 100
        assert len(np.unique(verts.round(5), axis=0)) == len(verts)
        assert 0.45 < len(verts) / len(tris) < 0.55
        e = np.sort(
            np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]]),
            axis=1,
        )
        _, counts = np.unique(e, axis=0, return_counts=True)
        assert (counts == 2).all()
