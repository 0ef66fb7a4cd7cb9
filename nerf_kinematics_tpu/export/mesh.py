"""Density grid → triangle mesh → PLY.

Pipeline parity with the reference's ``--save_mesh`` (instant-ngp
src/marching_cubes.cu; defaults 256³ grid, density threshold 2.5, wheel
export 2.7M verts / 5.2M tris — instant_ngp_collab_cloud.ipynb cell 28):
density is queried on-device (NGPEngine.density_grid), and the isosurface is
extracted by the native C++ core (native/mesh_extract.cpp, marching
tetrahedra, OpenMP) loaded via ctypes. A vectorized numpy fallback keeps the
path alive where the shared library can't be built.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libnkt_native.so"))
_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.mesh_extract.restype = ctypes.c_int
    lib.mesh_extract.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mesh_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def extract_mesh(
    grid: np.ndarray,
    iso: float = 2.5,
    bounds: Optional[Tuple[float, ...]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface of a (nx, ny, nz) density grid.

    Returns (verts (V, 3) float32, tris (T, 3) int32). ``bounds`` =
    (xmin, ymin, zmin, xmax, ymax, zmax), default unit cube.
    """
    grid = np.ascontiguousarray(grid, dtype=np.float32)
    nx, ny, nz = grid.shape
    if bounds is None:
        bounds = (0.0, 0.0, 0.0, 1.0, 1.0, 1.0)
    b = np.asarray(bounds, np.float32)

    lib = _load_native()
    if lib is not None:
        verts_p = ctypes.POINTER(ctypes.c_float)()
        tris_p = ctypes.POINTER(ctypes.c_int32)()
        nv = ctypes.c_int64()
        nt = ctypes.c_int64()
        rc = lib.mesh_extract(
            grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nx, ny, nz, ctypes.c_float(iso),
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(verts_p), ctypes.byref(nv),
            ctypes.byref(tris_p), ctypes.byref(nt),
        )
        if rc == 0:
            verts = np.ctypeslib.as_array(verts_p, shape=(nv.value, 3)).copy()
            tris = np.ctypeslib.as_array(tris_p, shape=(nt.value, 3)).copy()
            lib.mesh_free(verts_p)
            lib.mesh_free(tris_p)
            return verts, tris
    return _extract_mesh_numpy(grid, iso, b)


def _extract_mesh_numpy(grid, iso, bounds):
    """Vectorized numpy marching tetrahedra (fallback path).

    Like the native core, output vertices are globally welded: every
    vertex lies on a unique lattice edge (pair of global grid corners), so
    duplicates across tets/cells are collapsed by the canonical corner-pair
    key (np.unique) and triangles index the shared vertices — V ≈ T/2.
    """
    nx, ny, nz = grid.shape
    lo, hi = bounds[:3], bounds[3:]
    scale = (hi - lo) / (np.array([nx, ny, nz]) - 1)

    corner_off = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
         [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]]
    )
    tets = np.array(
        [[0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
         [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6]]
    )
    E = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]])
    tri_table = {
        1: [(0, 2, 1)], 2: [(0, 3, 4)], 3: [(1, 2, 3), (3, 2, 4)],
        4: [(1, 3, 5)], 5: [(0, 2, 3), (3, 2, 5)], 6: [(0, 1, 5), (0, 5, 4)],
        7: [(2, 4, 5)], 8: [(2, 5, 4)], 9: [(0, 5, 1), (0, 4, 5)],
        10: [(0, 3, 2), (3, 5, 2)], 11: [(1, 5, 3)],
        12: [(1, 3, 2), (3, 4, 2)], 13: [(0, 4, 3)], 14: [(0, 1, 2)],
    }

    # Cell corner coordinates/values for all cells.
    cx, cy, cz = np.meshgrid(
        np.arange(nx - 1), np.arange(ny - 1), np.arange(nz - 1), indexing="ij"
    )
    cells = np.stack([cx.ravel(), cy.ravel(), cz.ravel()], axis=1)  # (M, 3)
    cvals = np.stack(
        [grid[cells[:, 0] + o[0], cells[:, 1] + o[1], cells[:, 2] + o[2]]
         for o in corner_off], axis=1,
    )  # (M, 8)
    active = ((cvals > iso).any(1)) & ((cvals <= iso).any(1))
    cells, cvals = cells[active], cvals[active]
    cpos = (cells[:, None, :] + corner_off[None]) * scale + lo  # (M, 8, 3)
    # Global lattice corner ids, for the welding keys.
    cg = cells[:, None, :] + corner_off[None]  # (M, 8, 3)
    cgid = ((cg[..., 0] * ny + cg[..., 1]) * nz + cg[..., 2]).astype(np.uint64)

    verts_out, keys_out, tris_out = [], [], []
    vcount = 0
    for tet in tets:
        tv = cvals[:, tet]  # (M, 4)
        tp = cpos[:, tet]  # (M, 4, 3)
        tg = cgid[:, tet]  # (M, 4)
        code = ((tv > iso) * np.array([1, 2, 4, 8])).sum(1)
        for c, tris in tri_table.items():
            m = code == c
            n = int(m.sum())
            if n == 0:
                continue
            sv, sp, sg = tv[m], tp[m], tg[m]
            edges = sorted({e for tri in tris for e in tri})
            edge_base = {}
            for e in edges:
                a, b_ = E[e]
                t = (iso - sv[:, a]) / (sv[:, b_] - sv[:, a] + 1e-30)
                t = np.clip(t, 0, 1)[:, None]
                verts_out.append(sp[:, a] + t * (sp[:, b_] - sp[:, a]))
                ga, gb = sg[:, a], sg[:, b_]
                keys_out.append(
                    (np.minimum(ga, gb) << np.uint64(32)) | np.maximum(ga, gb)
                )
                edge_base[e] = vcount
                vcount += n
            for tri in tris:
                tris_out.append(
                    np.stack([np.arange(n) + edge_base[e] for e in tri], axis=1)
                )
    if not verts_out:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    verts = np.concatenate(verts_out).astype(np.float32)
    keys = np.concatenate(keys_out)
    tris = np.concatenate(tris_out).astype(np.int32)
    # Weld: one vertex per lattice edge; remap triangle indices.
    _, first, inverse = np.unique(keys, return_index=True, return_inverse=True)
    return verts[first], inverse.astype(np.int32)[tris]


def save_ply(path: str, verts: np.ndarray, tris: np.ndarray) -> None:
    """Binary little-endian PLY writer."""
    verts = np.asarray(verts, np.float32)
    tris = np.asarray(tris, np.int32)
    with open(path, "wb") as f:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(tris)}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        f.write(header.encode())
        f.write(verts.astype("<f4").tobytes())
        face = np.empty(len(tris), dtype=[("n", "u1"), ("idx", "<i4", 3)])
        face["n"] = 3
        face["idx"] = tris
        f.write(face.tobytes())


def load_ply(path: str):
    """Minimal reader for the files save_ply writes (tests/roundtrips)."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        lines = header.decode().splitlines()
        nv = int(next(l.split()[-1] for l in lines if l.startswith("element vertex")))
        nt = int(next(l.split()[-1] for l in lines if l.startswith("element face")))
        verts = np.frombuffer(f.read(nv * 12), dtype="<f4").reshape(nv, 3)
        face = np.frombuffer(
            f.read(nt * 13), dtype=[("n", "u1"), ("idx", "<i4", 3)]
        )
        return verts.copy(), face["idx"].copy()


def extract_mesh_from_engine(
    engine, params, resolution: int = 256, iso: float = 2.5, path: Optional[str] = None
):
    """Full ``--save_mesh`` path: TPU density query → native extraction → PLY."""
    g = engine.density_grid(params, resolution=resolution)
    # Finish on-device BEFORE converting: np.asarray on an in-flight array
    # pulls through the remote-chip tunnel's slow streaming path (measured
    # 400 s for the 67 MB 256³ grid vs ~7 s for ready-then-pull).
    g.block_until_ready()
    grid = np.asarray(g)
    b = engine.scene_bound
    verts, tris = extract_mesh(grid, iso=iso, bounds=(-b, -b, -b, b, b, b))
    if path is not None:
        save_ply(path, verts, tris)
    return verts, tris
