"""Multiresolution hash-grid encoding (the Instant-NGP-class encoder).

TPU-native equivalent of tiny-cuda-nn's GridEncoding (reference logged config:
``GridEncoding: Nmin=16 b≈2.21-2.44 F=4 T=2^19 L=8``, ~12.7M params,
instant_ngp_collab_cloud.ipynb cells 23/25/28). Levels whose dense grid fits
in the table are dense-indexed; finer levels use the spatial hash
h = x ⊕ y·2654435761 ⊕ z·805459861 (mod T).

Design for TPU/XLA: the per-level computation is a statically unrolled Python
loop (L is small and static) of broadcasted integer math + one table gather
per level — XLA lowers the gathers natively and fuses the trilinear
interpolation arithmetic around them; the backward pass autodiffs to
scatter-adds. The table is stored as one (L, T, F) array so the whole encoder
is a single parameter leaf (replicated or sharded over the mesh like any
other param).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Spatial-hash prime multipliers (dimension 0 is identity).
_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 8  # L
    n_features: int = 4  # F
    log2_table_size: int = 19  # T = 2^19
    base_resolution: int = 16  # Nmin
    max_resolution: int = 2048  # Nmax (scaled by scene aabb upstream)

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    @property
    def per_level_scale(self) -> float:
        """Growth factor b = exp((ln Nmax - ln Nmin)/(L-1))."""
        if self.n_levels == 1:
            return 1.0
        return math.exp(
            (math.log(self.max_resolution) - math.log(self.base_resolution))
            / (self.n_levels - 1)
        )

    @property
    def resolutions(self) -> Sequence[int]:
        b = self.per_level_scale
        return [
            int(math.floor(self.base_resolution * (b**l)))
            for l in range(self.n_levels)
        ]

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features

    @property
    def n_params(self) -> int:
        return self.n_levels * self.table_size * self.n_features


def init_table(key, cfg: HashGridConfig, dtype=jnp.float32):
    """(L, T, F) table, uniform in [-1e-4, 1e-4] (the standard NGP init)."""
    return jax.random.uniform(
        key,
        (cfg.n_levels, cfg.table_size, cfg.n_features),
        dtype=dtype,
        minval=-1e-4,
        maxval=1e-4,
    )


def _level_indices(x0: jnp.ndarray, res: int, table_size: int) -> jnp.ndarray:
    """Corner indices for one level. x0: (..., 8, 3) int32 corner coords.

    Dense row-major indexing when the padded grid fits in the table,
    otherwise the NGP spatial hash. Both are pure int math on the VPU.
    """
    n = res + 1
    if n**3 <= table_size:
        return x0[..., 0] + n * (x0[..., 1] + n * x0[..., 2])
    # uint32 wrap-around multiply-xor hash; only the low log2(T) bits survive
    # the mask, and 2^19 | 2^32 so wrapping is exact.
    u = x0.astype(jnp.uint32)
    h = u[..., 0] * jnp.uint32(_PRIMES[0])
    h = h ^ (u[..., 1] * jnp.uint32(_PRIMES[1]))
    h = h ^ (u[..., 2] * jnp.uint32(_PRIMES[2]))
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


# Corner offsets of the unit cube, shaped for broadcasting: (8, 3).
_CORNERS = np.array(
    [[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)], dtype=np.int32
)


def hash_encode(table: jnp.ndarray, x: jnp.ndarray, cfg: HashGridConfig) -> jnp.ndarray:
    """Encode points x ∈ [0,1]^3 → (..., L*F) features.

    table: (L, T, F). Out-of-box inputs are clamped (the caller decides the
    scene→unit-cube mapping).
    """
    orig_shape = x.shape[:-1]
    x = x.reshape(-1, 3)
    x = jnp.clip(x, 0.0, 1.0)

    corners = jnp.asarray(_CORNERS)  # (8, 3)
    feats = []
    for l, res in enumerate(cfg.resolutions):
        xs = x * res  # (N, 3); NGP scales by res, grid has res+1 vertices
        # Clip BEFORE the weight so boundary points (x == 1.0 → xs == res)
        # get x0 = res-1, w = 1 and interpolate toward vertex `res`, matching
        # hash_encode_ref / NGP semantics.
        x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, res - 1)
        w = xs - x0  # (N, 3) in [0,1]

        corner_coords = x0[:, None, :] + corners[None, :, :]  # (N, 8, 3)
        idx = _level_indices(corner_coords, res, cfg.table_size)  # (N, 8)
        level_feats = jnp.take(table[l], idx, axis=0)  # (N, 8, F)

        # Trilinear weights: prod over dims of (w or 1-w) per corner.
        cw = jnp.where(corners[None, :, :] == 1, w[:, None, :], 1.0 - w[:, None, :])
        weights = cw.prod(axis=-1)  # (N, 8)
        feats.append((level_feats * weights[..., None]).sum(axis=1))  # (N, F)

    out = jnp.concatenate(feats, axis=-1)  # (N, L*F)
    return out.reshape(*orig_shape, cfg.out_dim)


def hash_encode_ref(table, x, cfg: HashGridConfig):
    """Slow, obviously-correct reference (pure numpy, scalar corners) used by
    kernel tests to validate hash_encode."""
    table = np.asarray(table)
    x = np.clip(np.asarray(x, np.float64).reshape(-1, 3), 0.0, 1.0)
    N = x.shape[0]
    out = np.zeros((N, cfg.out_dim), np.float64)
    for l, res in enumerate(cfg.resolutions):
        n = res + 1
        dense = n**3 <= cfg.table_size
        for i in range(N):
            xs = x[i] * res
            x0 = np.minimum(np.floor(xs).astype(np.int64), res - 1)
            w = xs - x0
            acc = np.zeros(cfg.n_features)
            for c in range(8):
                off = np.array([(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1])
                cc = x0 + off
                if dense:
                    idx = cc[0] + n * (cc[1] + n * cc[2])
                else:
                    idx = (
                        (cc[0] * _PRIMES[0])
                        ^ (cc[1] * _PRIMES[1])
                        ^ (cc[2] * _PRIMES[2])
                    ) & (cfg.table_size - 1)
                weight = np.prod(np.where(off == 1, w, 1.0 - w))
                acc += weight * table[l, idx]
            out[i, l * cfg.n_features : (l + 1) * cfg.n_features] = acc
    return out
