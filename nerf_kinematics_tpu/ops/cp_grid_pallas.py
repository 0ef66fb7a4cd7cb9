"""Pallas TPU kernel for the folded CP-grid encoder.

The XLA version (ops/cp_grid.py) materializes the (N, table_size) two-hot
weight operand in HBM — measured tens of ms per training batch on v5e. This
kernel fuses weight construction + the line-table matmuls + the componentwise
product into one VMEM-resident program:

  - all line tables live in VMEM for the whole kernel ((L, 3, T, C) floats —
    e.g. L=4, T=256, C=32 → 393 KB);
  - each grid step processes a block of B points: builds the (B, T) periodic
    two-hot weights in registers/VMEM, feeds the MXU, writes only the
    (B, L*C) features back to HBM;
  - the backward kernel recomputes weights and accumulates dL/dlines with
    Wᵀ @ g matmuls into a VMEM accumulator carried across sequential grid
    steps (TPU grids execute in order) — the gradient never scatters.

HBM traffic is N*(3 + L*C) floats total; the fold (periodic index wrap, see
CPGridConfig.table_size) caps the weight width at T independent of effective
resolution, so VPU work per point is O(L*3*T) and the MXU matmuls stay
(B, T) @ (T, C). Wired as jax.custom_vjp; CPU tests run via interpret mode.

Line tables here are one stacked (L, 3, T, C) array — the parameter format of
NGPModel when ``encoder: cp_pallas``.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cp_grid import CPGridConfig

DEFAULT_BLOCK = 512  # VMEM-safe under scan/while wrapping (Mosaic multi-buffers)


def stack_lines(lines: Sequence[jnp.ndarray], cfg: CPGridConfig) -> jnp.ndarray:
    """List of per-level (3, T, C) tables → one (L, 3, T, C) array."""
    return jnp.stack(list(lines), axis=0)


def init_stacked_lines(key, cfg: CPGridConfig, dtype=jnp.float32) -> jnp.ndarray:
    return 0.5 + 0.1 * jax.random.normal(
        key, (cfg.n_levels, 3, cfg.table_size, cfg.n_components), dtype=dtype
    )


def _axis_weights(pos_a, iota_i32, R_eff: int, table: int, wdtype):
    """(B,) effective-resolution positions → (B, T) periodic two-hot rows."""
    pos = jnp.clip(pos_a, 0.0, R_eff - 1e-4)
    i0 = jnp.floor(pos)
    w = (pos - i0)[:, None]
    i0i = i0.astype(jnp.int32)
    idx0 = jnp.mod(i0i, table)[:, None]
    idx1 = jnp.mod(i0i + 1, table)[:, None]
    W = jnp.where(iota_i32 == idx0, 1.0 - w, 0.0) + jnp.where(iota_i32 == idx1, w, 0.0)
    return W.astype(wdtype)


def _fwd_kernel(x_ref, lines_ref, out_ref, *, cfg: CPGridConfig, wdtype):
    B = x_ref.shape[0]
    T = cfg.table_size
    C = cfg.n_components
    x = jnp.clip(x_ref[:], 0.0, 1.0)  # (B, 3)
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    for l, R in enumerate(cfg.resolutions):
        pos = x * R
        u = []
        for a in range(3):
            W = _axis_weights(pos[:, a], iota, R, T, wdtype)
            u.append(
                jnp.dot(
                    W,
                    lines_ref[l, a].astype(wdtype),
                    preferred_element_type=jnp.float32,
                )
            )
        out_ref[:, l * C : (l + 1) * C] = u[0] * u[1] * u[2]


def _bwd_kernel(x_ref, lines_ref, g_ref, dlines_ref, *, cfg: CPGridConfig, wdtype):
    B = x_ref.shape[0]
    T = cfg.table_size
    C = cfg.n_components

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dlines_ref[...] = jnp.zeros_like(dlines_ref)

    x = jnp.clip(x_ref[:], 0.0, 1.0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    for l, R in enumerate(cfg.resolutions):
        pos = x * R
        Ws, u = [], []
        for a in range(3):
            W = _axis_weights(pos[:, a], iota, R, T, wdtype)
            Ws.append(W)
            u.append(
                jnp.dot(
                    W,
                    lines_ref[l, a].astype(wdtype),
                    preferred_element_type=jnp.float32,
                )
            )
        g = g_ref[:, l * C : (l + 1) * C]  # (B, C)
        others = [u[1] * u[2], u[0] * u[2], u[0] * u[1]]
        for a in range(3):
            grad_u = (g * others[a]).astype(wdtype)  # (B, C)
            dlines_ref[l, a] += jnp.dot(
                Ws[a].T, grad_u, preferred_element_type=jnp.float32
            )


def _pad_points(x, block: int):
    n = x.shape[0]
    n_blocks = -(-n // block)
    pad = n_blocks * block - n
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)])
    return x, n, n_blocks


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def cp_encode_pallas(
    lines: jnp.ndarray,
    x: jnp.ndarray,
    cfg: CPGridConfig,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    """Encode x ∈ [0,1]^3 → (..., L*C). ``lines``: stacked (L, 3, T, C).

    GRADIENT CONTRACT: the custom VJP returns the exact cotangent for
    ``lines`` but a ZERO cotangent for ``x`` — sample positions are treated
    as non-differentiable data (they are stop-gradiented in every training
    path here). Do NOT differentiate through positions (normals, eikonal or
    pose-refinement losses) via this encoder; use ``cp_encode`` (pure-jnp,
    autodiff gives true dx) for that.
    """
    return _forward(lines, x, cfg, block, interpret)


def _forward(lines, x, cfg, block, interpret):
    orig = x.shape[:-1]
    xf, n, n_blocks = _pad_points(x.reshape(-1, 3), block)
    wdtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg, wdtype=wdtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full lines array
        ],
        out_specs=pl.BlockSpec(
            (block, cfg.out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks * block, cfg.out_dim), jnp.float32),
        interpret=interpret,
    )(xf, lines)
    return out[:n].reshape(*orig, cfg.out_dim)


def _forward_fwd(lines, x, cfg, block, interpret):
    return _forward(lines, x, cfg, block, interpret), (lines, x)


def _forward_bwd(cfg, block, interpret, res, g):
    lines, x = res
    xf, n, n_blocks = _pad_points(x.reshape(-1, 3), block)
    gf = g.reshape(-1, cfg.out_dim)
    if gf.shape[0] != xf.shape[0]:
        gf = jnp.concatenate(
            [gf, jnp.zeros((xf.shape[0] - gf.shape[0], cfg.out_dim), gf.dtype)]
        )
    wdtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
    dlines = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg, wdtype=wdtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block, cfg.out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        # Accumulator: same block every grid step (sequential on TPU).
        out_specs=pl.BlockSpec(
            lines.shape, lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(lines.shape, jnp.float32),
        interpret=interpret,
    )(xf, lines, gf)
    return dlines, jnp.zeros_like(x)


cp_encode_pallas.defvjp(_forward_fwd, _forward_bwd)
