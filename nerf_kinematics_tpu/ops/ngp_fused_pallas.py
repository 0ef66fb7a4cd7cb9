"""Fully-fused NGP point pipeline: one Pallas TPU kernel for
encode → density MLP → color MLP, forward and backward.

TPU-native equivalent of tiny-cuda-nn's ``fully_fused_mlp.cu`` composed with
the reference's GridEncoding (instant-ngp keeps the whole point→radiance
chain in registers/shared memory; SURVEY.md §7 step 8). Run as separate XLA
ops, the chain materializes every activation in HBM: at the flagship batch
(786k points/step) the 240-wide encoder output alone is ~380 MB bf16 per
direction, and the full fwd+bwd inter-op traffic is gigabytes per step —
the measured bottleneck once the encoder kernel itself was fast
(ARCHITECTURE.md §8). Here a block of points flows through the entire chain
inside VMEM; HBM sees only points (3), SH features (16), rgb+σ (4) and the
parameter/gradient arrays.

Layout choices follow ops/cp_grid_pallas.py (points-in-lanes hat-function
weights for the encoder; dot_general picks contraction dims so nothing
transposes). MLP matmuls run in bf16 on the MXU with f32 accumulation.
The backward kernel recomputes the forward (no residuals) and accumulates
parameter gradients in VMEM across sequential grid steps.

GRADIENT CONTRACT (same as cp_encode_pallas): exact cotangents for the
line tables and every MLP weight/bias; ZERO cotangents for point positions
and SH features (both are stop-gradiented data in every training path).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cp_grid import CPGridConfig
from .cp_grid_pallas import _hat_weights

DEFAULT_BLOCK = 512


def _encode_block(xt, lines_ref, cfg: CPGridConfig, wdtype):
    """(3, B) points → (B, L*C) f32 encoding (in-register)."""
    B = xt.shape[1]
    T, C = cfg.table_size, cfg.n_components
    xx = jnp.clip(xt, 0.0, 1.0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, B), 0).astype(jnp.float32)
    dims = (((0,), (0,)), ((), ()))
    outs = []
    for l, R in enumerate(cfg.resolutions):
        pos = xx * R
        u = []
        for a in range(3):
            W = _hat_weights(pos[a : a + 1], iota, R, T, wdtype)
            u.append(
                jax.lax.dot_general(
                    W, lines_ref[l, a].astype(wdtype), dims,
                    preferred_element_type=jnp.float32,
                )
            )
        outs.append(u[0] * u[1] * u[2])
    return jnp.concatenate(outs, axis=-1)


def _mlp_fwd_block(h, weights, biases, wdtype, save_pre=False):
    """Dense chain with ReLU between layers (none after the last).
    Returns (out, pre_activations list if save_pre)."""
    pres = []
    n = len(weights)
    for i in range(n):
        z = (
            jax.lax.dot_general(
                h.astype(wdtype), weights[i].astype(wdtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + biases[i]
        )
        if save_pre:
            pres.append((h, z))  # (layer input, pre-activation)
        h = jnp.maximum(z, 0.0) if i < n - 1 else z
    return h, pres


def _sigma_from_feat(feat):
    z0 = jnp.clip(feat[:, 0:1], -15.0, 15.0)
    return jnp.exp(z0)


def _fwd_kernel(xt_ref, sh_ref, lines_ref, *param_refs,
                cfg: CPGridConfig, nd: int, nc: int, wdtype):
    """params order: dW[0..nd-1], db[0..nd-1], cW[0..nc-1], cb[0..nc-1];
    final ref is the output (B, 4): rgb logits + σ."""
    out_ref = param_refs[-1]
    dW = [param_refs[i] for i in range(nd)]
    db = [param_refs[nd + i] for i in range(nd)]
    cW = [param_refs[2 * nd + i] for i in range(nc)]
    cb = [param_refs[2 * nd + nc + i] for i in range(nc)]

    enc = _encode_block(xt_ref[:], lines_ref, cfg, wdtype)
    feat, _ = _mlp_fwd_block(enc, [w[:] for w in dW], [b[:] for b in db],
                             wdtype)
    sigma = _sigma_from_feat(feat)
    h = jnp.concatenate([feat, sh_ref[:]], axis=-1)
    rgb, _ = _mlp_fwd_block(h, [w[:] for w in cW], [b[:] for b in cb], wdtype)
    out_ref[:, 0:3] = rgb
    out_ref[:, 3:4] = sigma


def _mlp_bwd_block(g, pres, weights, wdtype):
    """Backprop through a Dense chain. ``pres``: [(input, pre_act)] per
    layer from the forward. Returns (d_input, [dW], [db])."""
    n = len(weights)
    dWs, dbs = [None] * n, [None] * n
    for i in reversed(range(n)):
        inp, z = pres[i]
        if i < n - 1:
            g = g * (z > 0.0)
        gw = g.astype(wdtype)
        # dW = inp^T @ g : contract the batch dim of both.
        dWs[i] = jax.lax.dot_general(
            inp.astype(wdtype), gw, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbs[i] = jnp.sum(g, axis=0, keepdims=True)
        # d_inp = g @ W^T : contract the output dim.
        g = jax.lax.dot_general(
            gw, weights[i].astype(wdtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return g, dWs, dbs


def _bwd_kernel(xt_ref, sh_ref, lines_ref, *refs,
                cfg: CPGridConfig, nd: int, nc: int, wdtype):
    """refs: dW, db, cW, cb (params), g (B,4) — then outputs:
    dlines, ddW[nd], ddb[nd], dcW[nc], dcb[nc] (all accumulated)."""
    n_params = 2 * nd + 2 * nc
    dW = [refs[i] for i in range(nd)]
    db = [refs[nd + i] for i in range(nd)]
    cW = [refs[2 * nd + i] for i in range(nc)]
    cb = [refs[2 * nd + nc + i] for i in range(nc)]
    g_ref = refs[n_params]
    outs = refs[n_params + 1:]
    dlines_ref = outs[0]
    ddW = outs[1 : 1 + nd]
    ddb = outs[1 + nd : 1 + 2 * nd]
    dcW = outs[1 + 2 * nd : 1 + 2 * nd + nc]
    dcb = outs[1 + 2 * nd + nc : 1 + 2 * nd + 2 * nc]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in outs:
            r[...] = jnp.zeros_like(r)

    B = xt_ref.shape[1]
    T, C = cfg.table_size, cfg.n_components
    xx = jnp.clip(xt_ref[:], 0.0, 1.0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, B), 0).astype(jnp.float32)
    fwd_dims = (((0,), (0,)), ((), ()))
    acc_dims = (((1,), (0,)), ((), ()))

    # ---- recompute forward, keeping residuals as in-register values ----
    Ws_all, u_all, enc_parts = [], [], []
    for l, R in enumerate(cfg.resolutions):
        pos = xx * R
        Ws, u = [], []
        for a in range(3):
            W = _hat_weights(pos[a : a + 1], iota, R, T, wdtype)
            Ws.append(W)
            u.append(
                jax.lax.dot_general(
                    W, lines_ref[l, a].astype(wdtype), fwd_dims,
                    preferred_element_type=jnp.float32,
                )
            )
        Ws_all.append(Ws)
        u_all.append(u)
        enc_parts.append(u[0] * u[1] * u[2])
    enc = jnp.concatenate(enc_parts, axis=-1)

    dWv = [w[:] for w in dW]
    dbv = [b[:] for b in db]
    cWv = [w[:] for w in cW]
    cbv = [b[:] for b in cb]
    feat, d_pres = _mlp_fwd_block(enc, dWv, dbv, wdtype, save_pre=True)
    sigma = _sigma_from_feat(feat)
    h = jnp.concatenate([feat, sh_ref[:]], axis=-1)
    _, c_pres = _mlp_fwd_block(h, cWv, cbv, wdtype, save_pre=True)

    # ---- backward ------------------------------------------------------
    g_rgb = g_ref[:, 0:3]
    g_sigma = g_ref[:, 3:4]
    dh, dcWs, dcbs = _mlp_bwd_block(g_rgb, c_pres, cWv, wdtype)
    d_feat = dh[:, : feat.shape[1]]
    # σ = exp(clip(z0)): route dσ into feat channel 0 where unclipped.
    # (Masked broadcast-add: Mosaic has no scatter-add primitive.)
    z0 = feat[:, 0:1]
    live = jnp.logical_and(z0 > -15.0, z0 < 15.0)
    dz0 = jnp.where(live, g_sigma * sigma, 0.0)  # (B, 1)
    col0 = (
        jax.lax.broadcasted_iota(jnp.int32, d_feat.shape, 1) == 0
    ).astype(d_feat.dtype)
    d_feat = d_feat + dz0 * col0
    d_enc, ddWs, ddbs = _mlp_bwd_block(d_feat, d_pres, dWv, wdtype)

    for i in range(nc):
        dcW[i][...] += dcWs[i]
        dcb[i][...] += dcbs[i]
    for i in range(nd):
        ddW[i][...] += ddWs[i]
        ddb[i][...] += ddbs[i]

    # ---- encoder backward (as in cp_grid_pallas) ------------------------
    for l in range(cfg.n_levels):
        u = u_all[l]
        g_l = d_enc[:, l * C : (l + 1) * C]
        others = [u[1] * u[2], u[0] * u[2], u[0] * u[1]]
        for a in range(3):
            grad_u = (g_l * others[a]).astype(wdtype)
            dlines_ref[l, a] += jax.lax.dot_general(
                Ws_all[l][a], grad_u, acc_dims,
                preferred_element_type=jnp.float32,
            )


def _pad_to_blocks(arr, block: int, axis: int):
    n = arr.shape[axis]
    n_blocks = -(-n // block)
    pad = n_blocks * block - n
    if pad:
        widths = [(0, 0)] * arr.ndim
        widths[axis] = (0, pad)
        arr = jnp.pad(arr, widths)
    return arr, n, n_blocks


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def ngp_fused_apply(
    params: dict,
    x: jnp.ndarray,
    sh: jnp.ndarray,
    cfg: CPGridConfig,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
):
    """Fused point pipeline. ``params``: {"lines": (L,3,T,C),
    "dW": [..], "db": [..], "cW": [..], "cb": [..]} (biases shaped (1, n)).
    ``x``: (..., 3) unit-cube points; ``sh``: (..., S) view features.
    Returns (rgb logits (..., 3), σ (...,)).
    """
    return _fused_forward(params, x, sh, cfg, block, interpret)


def _flatten_params(params):
    return (
        [params["lines"]]
        + list(params["dW"]) + list(params["db"])
        + list(params["cW"]) + list(params["cb"])
    )


def _fused_forward(params, x, sh, cfg, block, interpret):
    orig = x.shape[:-1]
    xt = x.reshape(-1, 3).T
    shf = sh.reshape(-1, sh.shape[-1])
    xt, n, n_blocks = _pad_to_blocks(xt, block, axis=1)
    shf, _, _ = _pad_to_blocks(shf, block, axis=0)
    nd, nc = len(params["dW"]), len(params["cW"])
    wdtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32

    flat = _flatten_params(params)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg, nd=nd, nc=nc, wdtype=wdtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((3, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, sh.shape[-1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat],
        out_specs=pl.BlockSpec((block, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * block, 4), jnp.float32),
        interpret=interpret,
    )(xt, shf, *flat)
    out = out[:n]
    rgb = out[:, 0:3].reshape(*orig, 3)
    sigma = out[:, 3].reshape(orig)
    return rgb, sigma


def _fused_fwd(params, x, sh, cfg, block, interpret):
    return _fused_forward(params, x, sh, cfg, block, interpret), (params, x, sh)


def _fused_bwd(cfg, block, interpret, res, g):
    params, x, sh = res
    g_rgb, g_sigma = g
    orig_n = x.reshape(-1, 3).shape[0]
    xt = x.reshape(-1, 3).T
    shf = sh.reshape(-1, sh.shape[-1])
    gf = jnp.concatenate(
        [g_rgb.reshape(-1, 3), g_sigma.reshape(-1, 1)], axis=-1
    )
    xt, n, n_blocks = _pad_to_blocks(xt, block, axis=1)
    shf, _, _ = _pad_to_blocks(shf, block, axis=0)
    gf, _, _ = _pad_to_blocks(gf, block, axis=0)
    nd, nc = len(params["dW"]), len(params["cW"])
    wdtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32

    flat = _flatten_params(params)
    out_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in flat]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg, nd=nd, nc=nc, wdtype=wdtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((3, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, sh.shape[-1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat]
        + [pl.BlockSpec((block, 4), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec(s.shape, lambda i, _s=s: (0,) * len(_s.shape),
                         memory_space=pltpu.VMEM)
            for s in out_shapes
        ],
        out_shape=out_shapes,
        interpret=interpret,
    )(xt, shf, *flat, gf)

    d_lines = outs[0]
    d_params = {
        "lines": d_lines,
        "dW": list(outs[1 : 1 + nd]),
        "db": list(outs[1 + nd : 1 + 2 * nd]),
        "cW": list(outs[1 + 2 * nd : 1 + 2 * nd + nc]),
        "cb": list(outs[1 + 2 * nd + nc : 1 + 2 * nd + 2 * nc]),
    }
    return d_params, jnp.zeros_like(x), jnp.zeros_like(sh)


ngp_fused_apply.defvjp(_fused_fwd, _fused_bwd)
