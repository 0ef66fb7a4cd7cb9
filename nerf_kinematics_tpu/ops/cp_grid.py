"""CP-factorized multiresolution grid encoder — the TPU-first fast encoder.

Why this exists (design decision, SURVEY.md §7 "hard parts"): Instant-NGP's
hash-grid encoding is built around fine-grained random HBM access — perfect
for GPU L2 caches, pathological on TPU, where XLA gathers run ~100M lookups/s
and scatter-add gradients are several times slower still (measured on v5e:
74 ms forward + 376 ms backward for a 131k-point batch — vs ~2 ms of MXU
math for the same batch). A faithful hash-grid port can never reach TPU
speed-of-light.

This encoder replaces the hash table with a CP (CANDECOMP/PARAFAC)
factorization of the feature volume, à la TensoRF: per level l and axis a, a
line table U_la ∈ R^{R_l × C}; a point's feature is the componentwise product
of the three linearly-interpolated line features,

    f_l(x, y, z) = U_lx[x] * U_ly[y] * U_lz[z]   ∈ R^C.

The interpolation is expressed as a *two-hot weight matrix times the line
table* — a dense (N, R) @ (R, C) matmul per axis per level. Everything is
MXU work with perfectly coalesced memory traffic; the backward pass is more
matmuls (W^T @ g), no scatters anywhere. Multi-resolution levels give the
same coarse-to-fine inductive bias as the hash pyramid.

The hash encoder (ops/hashgrid.py) remains available for architecture parity
with the reference (``encoder: hash``); this is the default (``encoder: cp``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Sequence

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class CPGridConfig:
    n_levels: int = 4
    n_components: int = 32  # C, feature channels per level
    base_resolution: int = 64
    max_resolution: int = 512
    # Fold width: each level's line table has exactly ``table_size`` entries.
    # Levels whose effective resolution R_l exceeds it wrap periodically
    # (idx = floor(pos) mod table_size) — the hash-grid collision principle
    # applied along each CP axis. This caps the one-hot operand at
    # (N, table_size) regardless of resolution, keeping the interpolation a
    # small dense matmul at any scale.
    table_size: int = 256
    # Points per interpolation chunk: bounds the (chunk, table_size) operand.
    chunk_size: int = 16384
    # bf16 two-hot/line operands (f32 accumulate).
    use_bf16: bool = True
    # Fold mode for levels finer than the table ("periodic" | "hash").
    # "periodic" wraps indices mod table_size: cells exactly table_size
    # apart share a row, so each folded level is a spatially PERIODIC
    # function — structured aliasing. "hash" maps each cell through an
    # integer mix (Knuth multiplicative + xor-shift, the instant-ngp
    # collision principle applied per CP axis) so colliding cells are
    # pseudo-random instead of periodic. Identical matmul cost: the
    # two-hot operand is built by iota comparison either way; only the
    # two target rows per point change. Levels with R < table_size never
    # fold and are unaffected (they keep the sliced tent rows).
    fold: str = "periodic"
    # Per-level fold-width cap (0 = off). When set, any level with
    # R >= fold_cap is folded into min(table_size, fold_cap) rows instead
    # of the full table — the contraction for that level shrinks to the
    # capped row count (the tent-row slicing economics applied to FOLDED
    # levels), while coarser levels keep full capacity. Rows beyond the
    # cap are dead for that level (zero gradient; storage stays (T, C)).
    fold_cap: int = 0

    @property
    def resolutions(self) -> Sequence[int]:
        if self.n_levels == 1:
            return [self.base_resolution]
        b = math.exp(
            (math.log(self.max_resolution) - math.log(self.base_resolution))
            / (self.n_levels - 1)
        )
        return [
            int(round(self.base_resolution * (b**l))) for l in range(self.n_levels)
        ]

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_components

    def level_rows(self, R: int) -> int:
        """Line-table rows actually reachable at level resolution ``R``.

        The interpolation tent over positions p ∈ [0, R) is nonzero only at
        rows t ≤ R, so levels finer than the fold width touch just R+1 rows;
        the rest of the (table_size, C) table is dead weight in both the
        weight build and the contraction. Rounded up to the 16-sublane tile
        (bf16 operand tiling) so kernels can slice tables statically.
        Contributions from the extra zero rows are exactly 0 — slicing is
        bitwise-identical to the full-table contraction.
        """
        if self.fold_cap and R >= self.fold_cap:
            return min(self.table_size, -(-self.fold_cap // 16) * 16)
        if R >= self.table_size:
            return self.table_size
        return min(self.table_size, -(-(R + 1) // 16) * 16)

    def level_fold(self, R: int) -> int:
        """Fold modulus for level resolution ``R``: 0 if the level never
        wraps (tent interpolation over R+1 rows), else the row count its
        indices wrap into (= level_rows)."""
        rows = self.level_rows(R)
        return rows if R >= rows else 0

    def level_rows_dup(self, R: int) -> int:
        """Kernel-facing row count for the duplicated-wrap-row tent.

        Periodic folded levels are evaluated with a PLAIN tent over F+1 rows
        where row F is a copy of row 0 (maintained outside the kernel): the
        circular distance min(d, F-d) then never needs computing — two fewer
        VPU ops per (row, point) weight element, same function exactly.
        Non-folded and hash-folded levels are unchanged. 16-sublane aligned
        (bf16 operand tiling)."""
        F = self.level_fold(R)
        if F and self.fold == "periodic":
            return -(-(F + 1) // 16) * 16
        return self.level_rows(R)

    @property
    def dup_rows(self) -> int:
        """Stacked-lines row count the fused kernels consume:
        max over levels of level_rows_dup (>= table_size when any folded
        level needs its wrap row duplicated past the table end)."""
        return max(
            self.table_size,
            max(self.level_rows_dup(R) for R in self.resolutions),
        )

    @property
    def n_params(self) -> int:
        return self.n_levels * 3 * self.table_size * self.n_components


def init_cp_lines(key, cfg: CPGridConfig, dtype=jnp.float32) -> List[jnp.ndarray]:
    """One (3, table_size, C) array per level. Init 0.5 ± 0.1 so the 3-way
    product starts near 0.1 with sign diversity."""
    keys = jax.random.split(key, cfg.n_levels)
    return [
        0.5 + 0.1 * jax.random.normal(k, (3, cfg.table_size, cfg.n_components), dtype=dtype)
        for k in keys
    ]


def fold_salt(level: int, axis: int) -> int:
    """Per-(level, axis) hash salt (decorrelates collision patterns),
    wrapped to signed int32."""
    v = ((3 * level + axis + 1) * 374761393) & 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def hash_fold_indices(i0, table: int, salt: int):
    """Integer cell index → hashed table row, as exact-integer f32.

    ``i0``: f32 array of non-negative integer cell indices. Knuth
    multiplicative mix + xor-shift in wrapping int32 (identical semantics
    in XLA, Mosaic, and the numpy reference), then reduced mod ``table``
    through an exact low-24-bit float path (TPU vector units have no
    integer divide; f32 holds 24-bit integers exactly, with an off-by-one
    floor correction for quotient rounding).
    """
    h = (i0.astype(jnp.int32) + jnp.int32(salt)) * jnp.int32(-1640531527)
    h = h ^ (h >> 15)
    h = h * jnp.int32(-2048144789)
    h = h ^ (h >> 13)
    hf = (h & jnp.int32(0xFFFFFF)).astype(jnp.float32)
    idx = hf - jnp.floor(hf / table) * table
    return jnp.where(idx < 0, idx + table, idx)


def _hash_fold_ref(i0: int, table: int, salt: int) -> int:
    """Scalar python mirror of :func:`hash_fold_indices` (exact)."""

    def i32(v: int) -> int:
        v &= 0xFFFFFFFF
        return v - (1 << 32) if v >= (1 << 31) else v

    h = i32((int(i0) + salt) * -1640531527)
    h = i32(h ^ (h >> 15))
    h = i32(h * -2048144789)
    h = i32(h ^ (h >> 13))
    return (h & 0xFFFFFF) % table


def _two_hot_folded(
    pos: jnp.ndarray, R_eff: int, table: int, modulus: int = 0
) -> jnp.ndarray:
    """(N,) positions scaled to an effective resolution ``R_eff`` → (N, table)
    periodic linear-interp rows: 1-w at floor(pos) mod m, w at
    (floor(pos)+1) mod m, where m = ``modulus`` or ``table`` (fold_cap can
    wrap a level into fewer rows than the stored table). Built by iota
    comparison — pure VPU."""
    m = modulus or table
    pos = jnp.clip(pos, 0.0, R_eff - 1e-4)
    i0 = jnp.floor(pos)
    w = (pos - i0)[:, None]
    idx0 = jnp.mod(i0, m)[:, None]
    idx1 = jnp.mod(i0 + 1.0, m)[:, None]
    iota = jax.lax.broadcasted_iota(pos.dtype, (1, table), 1)
    return jnp.where(iota == idx0, 1.0 - w, 0.0) + jnp.where(iota == idx1, w, 0.0)


def _two_hot_hashed(
    pos: jnp.ndarray, R_eff: int, table: int, modulus: int, salt: int
) -> jnp.ndarray:
    """Hash-fold variant of :func:`_two_hot_folded`: same (N, table) two-hot
    operand, but rows chosen by :func:`hash_fold_indices` of the two cells
    (wrapped into ``modulus`` ≤ ``table`` rows — the level's fold width)."""
    pos = jnp.clip(pos, 0.0, R_eff - 1e-4)
    i0 = jnp.floor(pos)
    w = (pos - i0)[:, None]
    idx0 = hash_fold_indices(i0, modulus, salt)[:, None]
    idx1 = hash_fold_indices(i0 + 1.0, modulus, salt)[:, None]
    iota = jax.lax.broadcasted_iota(pos.dtype, (1, table), 1)
    return jnp.where(iota == idx0, 1.0 - w, 0.0) + jnp.where(iota == idx1, w, 0.0)


def cp_encode(lines: List[jnp.ndarray], x: jnp.ndarray, cfg: CPGridConfig,
              point_grads: bool = False) -> jnp.ndarray:
    """Encode x ∈ [0,1]^3 → (..., L*C) features. ``lines[l]``: (3, R_l, C).

    ``point_grads=True`` keeps the interpolation weights differentiable
    w.r.t. ``x`` (the tent derivative) — needed by pose refinement, where
    the photometric loss backpropagates into ray origins/directions. The
    default stop-gradients them (training treats positions as data; the
    backward then contains only line-table matmuls)."""
    orig = x.shape[:-1]
    x = jnp.clip(x.reshape(-1, 3), 0.0, 1.0)
    n = x.shape[0]

    chunk = min(cfg.chunk_size, max(n, 1))
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    xp = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)]) if pad else x
    xc = xp.reshape(n_chunks, chunk, 3)

    wdtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32

    def encode_chunk(pts):
        m = pts.shape[0]
        feats = []
        for l, R in enumerate(cfg.resolutions):
            pos = pts * R  # (m, 3) effective-resolution coordinates
            # All 3 axes share one batched two-hot build + einsum:
            # (3, m, T) x (3, T, C) → (3, m, C). Interp weights carry no
            # trainable state and point-grads are unused ⇒ stop_gradient
            # keeps the backward pass to pure line-table matmuls.
            F = cfg.level_fold(R)
            if cfg.fold == "hash" and F:
                W = jnp.concatenate([
                    _two_hot_hashed(pos[:, a], R, cfg.table_size, F,
                                    fold_salt(l, a))
                    for a in range(3)
                ])
            else:
                W = _two_hot_folded(pos.T.reshape(-1), R, cfg.table_size, F)
            if not point_grads:
                W = jax.lax.stop_gradient(W)
            W = W.reshape(3, m, cfg.table_size).astype(wdtype)
            u = jnp.einsum(
                "amr,arc->amc",
                W,
                lines[l].astype(wdtype),
                preferred_element_type=jnp.float32,
            )
            feats.append(u[0] * u[1] * u[2])
        return jnp.concatenate(feats, axis=-1)

    if n_chunks == 1:
        out = encode_chunk(xc[0])
    else:
        out = jax.lax.map(encode_chunk, xc).reshape(n_chunks * chunk, cfg.out_dim)
    return out[:n].reshape(*orig, cfg.out_dim)


def cp_encode_stacked(stacked: jnp.ndarray, x: jnp.ndarray,
                      cfg: CPGridConfig,
                      point_grads: bool = False) -> jnp.ndarray:
    """XLA mirror of ``cp_encode_pallas`` over the STACKED (L, 3, T, C)
    parameter table (the cp_pallas checkpoint format) — same function
    exactly: the kernel's dup-row plain tent equals the periodic two-hot
    built here (see ops/cp_grid_pallas._hat_weights).

    Exists for paths that need autodiff the Pallas kernel does not provide:
    ``point_grads=True`` keeps interpolation weights differentiable w.r.t.
    ``x`` — pose refinement backpropagates the photometric loss through ray
    generation into SE(3) pose deltas (poses/refine.py)."""
    orig = x.shape[:-1]
    x = jnp.clip(x.reshape(-1, 3), 0.0, 1.0)
    wdtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
    T = cfg.table_size
    feats = []
    for l, R in enumerate(cfg.resolutions):
        pos = x * R
        F = cfg.level_fold(R)
        us = []
        for a in range(3):
            if cfg.fold == "hash" and F:
                W = _two_hot_hashed(pos[:, a], R, T, F, fold_salt(l, a))
            else:
                W = _two_hot_folded(pos[:, a], R, T, F)
            if not point_grads:
                W = jax.lax.stop_gradient(W)
            us.append(
                jnp.matmul(W.astype(wdtype), stacked[l, a].astype(wdtype),
                           preferred_element_type=jnp.float32)
            )
        feats.append(us[0] * us[1] * us[2])
    return jnp.concatenate(feats, axis=-1).reshape(*orig, cfg.out_dim)


def cp_encode_ref(lines, x, cfg: CPGridConfig):
    """Scalar numpy reference for tests (folded/periodic semantics)."""
    import numpy as np

    T = cfg.table_size
    x = np.clip(np.asarray(x, np.float64).reshape(-1, 3), 0.0, 1.0)
    out = np.zeros((x.shape[0], cfg.out_dim))
    for l, R in enumerate(cfg.resolutions):
        tab = np.asarray(lines[l], np.float64)
        F = cfg.level_fold(R)
        m = F or T
        hashed = cfg.fold == "hash" and F
        for i, p in enumerate(x):
            prod = np.ones(cfg.n_components)
            for a in range(3):
                pos = min(p[a] * R, R - 1e-4)
                i0 = int(np.floor(pos))
                w = pos - i0
                if hashed:
                    s = fold_salt(l, a)
                    r0 = _hash_fold_ref(i0, m, s)
                    r1 = _hash_fold_ref(i0 + 1, m, s)
                else:
                    r0, r1 = i0 % m, (i0 + 1) % m
                prod = prod * ((1 - w) * tab[a, r0] + w * tab[a, r1])
            out[i, l * cfg.n_components : (l + 1) * cfg.n_components] = prod
    return out
