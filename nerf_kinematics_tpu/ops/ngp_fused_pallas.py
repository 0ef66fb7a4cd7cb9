"""Fully-fused NGP point pipeline: one Pallas TPU kernel for
encode → density MLP → color MLP, forward and backward — channels-first.

TPU-native equivalent of tiny-cuda-nn's ``fully_fused_mlp.cu`` composed with
the reference's GridEncoding (instant-ngp keeps the whole point→radiance
chain in registers/shared memory; SURVEY.md §7 step 8). Run as separate XLA
ops the chain materializes every activation in HBM — gigabytes per step at
the flagship batch; fused, HBM sees only points, view directions, rgbσ and
the parameter/gradient arrays.

CHANNELS-FIRST LAYOUT (the round-2 redesign): every activation lives as
(features, points) — features in sublanes, the point block in lanes:

  - The encoder already wants points-in-lanes ((T, B) hat weights, see
    ops/cp_grid_pallas.py); emitting u = lines^T·W as (C, B) keeps that
    orientation instead of transposing to (B, C).
  - The MLPs run transposed: z = dot_general(W (in,out), h (in,B)) — the
    weight matrices stay in their natural parameter layout, the contraction
    runs over sublanes on both operands, and NO transpose exists anywhere
    in the kernel, forward or backward (the backward's dW = h·gᵀ contracts
    the lane dim of two (·, B) operands, again transpose-free).
  - IO is (3, N) points / (3, N) view directions → (4, N) rgbσ. Arrays
    whose LAST dim is 3 or 4 waste 125 of 128 lanes in every elementwise op
    that touches them (measured ~5 ms/step of such ops in the round-2
    profile); the (4, N) contract keeps the whole render path full-width.
    Compositing consumes this directly (ops/volume_render.raw2outputs_cf).
  - SH degree-4 view features are evaluated IN-KERNEL from (3, N) unit
    directions ((1, B)-row polynomial math on the VPU) — the (N, 16)
    feature array never exists in HBM.

MLP matmuls run in bf16 on the MXU with f32 accumulation. The backward
kernel recomputes the forward (no residuals) and accumulates parameter
gradients in VMEM across sequential grid steps.

GRADIENT CONTRACT (same as cp_encode_pallas): exact cotangents for the
line tables and every MLP weight/bias; ZERO cotangents for point positions
and view directions (both are stop-gradiented data in every training path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cp_grid import CPGridConfig, fold_salt
from .cp_grid_pallas import _hat_weights

# Measured on v5e at the flagship shape (393k-point pass, fwd+bwd):
# block 512: 7.6 ms, 1024: 5.8 ms, 2048: 5.4 ms, 4096: 5.3 ms — bigger
# blocks amortize the per-block parameter reloads and grid overhead. 2048+
# requires the raised VMEM_LIMIT below (the 16 MB Mosaic default OOMs).
# Small inputs are clamped to their own padded size (see _block_for).
DEFAULT_BLOCK = 4096

# Scoped-VMEM budget for the fused kernels. The Mosaic default (16 MB) is a
# compiler knob, not the hardware: v5e VMEM is 128 MB (probed empirically —
# a 120 MB scratch allocates fine). The backward kernel's per-block stack
# (per-level u residuals + MLP pre-activations + the dlines accumulator)
# crosses 16 MB once n_components grows past ~64 or the block past 1024;
# raising the cap is strictly better than spilling those to HBM. 96 MB
# leaves headroom for Mosaic's own double-buffering of the streamed blocks.
VMEM_LIMIT = 96 * 1024 * 1024


def _sh4_rows(vd):
    """(3, B) unit directions → (16, B) real SH basis rows (degree 4).

    Row-wise mirror of ops/sh.sh_encode (same constants, same order) so the
    color MLP sees identical inputs; (1, B) rows broadcast/concat along
    sublanes for free in the points-in-lanes layout.
    """
    x, y, z = vd[0:1], vd[1:2], vd[2:3]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    rows = [
        jnp.full_like(x, 0.28209479177387814),
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy,
        -1.0925484305920792 * yz,
        0.94617469575755997 * zz - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * (xx - yy),
        0.59004358992664352 * y * (-3.0 * xx + yy),
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * zz),
        0.3731763325901154 * z * (5.0 * zz - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * zz),
        1.4453057213202769 * z * (xx - yy),
        0.59004358992664352 * x * (-xx + 3.0 * yy),
    ]
    return jnp.concatenate(rows, axis=0)


def _encode_block_cf(xt, lines_ref, cfg: CPGridConfig, wdtype):
    """(3, B) points → (L*C, B) f32 encoding, channels in sublanes.

    ``lines_ref`` is the dup-row kernel operand (see ``dup_lines``): each
    periodic folded level's wrap row is materialized at row F, so the hat
    weights are always a PLAIN tent (dup=True) — no circular distance.
    """
    B = xt.shape[1]
    T, C = cfg.table_size, cfg.n_components
    xx = jnp.clip(xt, 0.0, 1.0)
    # lines (Tl, C) contracted with W (Tl, B) over Tl → (C, B).
    dims = (((0,), (0,)), ((), ()))
    outs = []
    for l, R in enumerate(cfg.resolutions):
        Tl = cfg.level_rows_dup(R)
        iota = jax.lax.broadcasted_iota(jnp.int32, (Tl, B), 0).astype(
            jnp.float32
        )
        pos = xx * R
        u = []
        for a in range(3):
            W = _hat_weights(pos[a : a + 1], iota, R, cfg.level_fold(R), wdtype,
                             cfg.fold, fold_salt(l, a), dup=True)
            u.append(
                jax.lax.dot_general(
                    lines_ref[l, a, :Tl, :].astype(wdtype), W, dims,
                    preferred_element_type=jnp.float32,
                )
            )
        outs.append(u[0] * u[1] * u[2])
    return jnp.concatenate(outs, axis=0)


def _mlp_fwd_cf(h, weights, biases, wdtype, save_pre=False):
    """Transposed dense chain: h (in, B) → (out, B); ReLU between layers.
    Weights in natural (in, out) layout, biases (out, 1)."""
    pres = []
    n = len(weights)
    for i in range(n):
        z = (
            jax.lax.dot_general(
                weights[i].astype(wdtype), h.astype(wdtype),
                (((0,), (0,)), ((), ())),  # contract `in` (sublanes both)
                preferred_element_type=jnp.float32,
            )
            + biases[i]
        )
        if save_pre:
            pres.append((h, z))
        h = jnp.maximum(z, 0.0) if i < n - 1 else z
    return h, pres


def _mlp_bwd_cf(g, pres, weights, wdtype):
    """Backprop the transposed chain. g (out, B) → (d_input (in, B),
    [dW (in, out)], [db (out, 1)])."""
    n = len(weights)
    dWs, dbs = [None] * n, [None] * n
    for i in reversed(range(n)):
        inp, z = pres[i]
        if i < n - 1:
            g = g * (z > 0.0)
        gw = g.astype(wdtype)
        # dW = inp · gᵀ : contract the lane (batch) dim of both → (in, out).
        dWs[i] = jax.lax.dot_general(
            inp.astype(wdtype), gw, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbs[i] = jnp.sum(g, axis=1, keepdims=True)
        # d_inp = W · g : contract `out` → (in, B).
        g = jax.lax.dot_general(
            weights[i].astype(wdtype), gw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return g, dWs, dbs


def _sigma_row(feat):
    z0 = jnp.clip(feat[0:1], -15.0, 15.0)
    return jnp.exp(z0)


def _fwd_kernel(xt_ref, vd_ref, lines_ref, *param_refs,
                cfg: CPGridConfig, nd: int, nc: int, wdtype):
    """params order: dW[0..nd-1], db[0..nd-1], cW[0..nc-1], cb[0..nc-1];
    final ref is the output (4, B): rgb logits rows 0-2, σ row 3."""
    out_ref = param_refs[-1]
    dW = [param_refs[i] for i in range(nd)]
    db = [param_refs[nd + i] for i in range(nd)]
    cW = [param_refs[2 * nd + i] for i in range(nc)]
    cb = [param_refs[2 * nd + nc + i] for i in range(nc)]

    enc = _encode_block_cf(xt_ref[:], lines_ref, cfg, wdtype)
    feat, _ = _mlp_fwd_cf(enc, [w[:] for w in dW], [b[:] for b in db], wdtype)
    sigma = _sigma_row(feat)
    h = jnp.concatenate([feat, _sh4_rows(vd_ref[:])], axis=0)
    rgb, _ = _mlp_fwd_cf(h, [w[:] for w in cW], [b[:] for b in cb], wdtype)
    out_ref[0:3, :] = rgb
    out_ref[3:4, :] = sigma


def _fwd_sigma_kernel(xt_ref, lines_ref, *param_refs,
                      cfg: CPGridConfig, nd: int, wdtype):
    """Density-only forward: encode → density MLP → σ row; rgb rows 0.
    No view directions, no SH basis, no color MLP — the proposal-only
    coarse pass (coarse_loss_weight 0) consumes just the σ row to build
    its importance PDF (instant-ngp likewise queries only the density
    model when maintaining/marching its occupancy grid)."""
    out_ref = param_refs[-1]
    dW = [param_refs[i] for i in range(nd)]
    db = [param_refs[nd + i] for i in range(nd)]
    enc = _encode_block_cf(xt_ref[:], lines_ref, cfg, wdtype)
    feat, _ = _mlp_fwd_cf(enc, [w[:] for w in dW], [b[:] for b in db], wdtype)
    out_ref[0:3, :] = jnp.zeros_like(out_ref[0:3, :])
    out_ref[3:4, :] = _sigma_row(feat)


def ngp_fused_sigma_cf(params, xt, cfg, block: int = DEFAULT_BLOCK,
                       interpret: bool = False):
    """Density-only fused forward, channels-first: (3, N) points → (4, N)
    with rows 0-2 ZERO and row 3 = σ. Same output contract as
    :func:`ngp_fused_apply_cf` so compositing consumes it unchanged. Not
    differentiable (no VJP) — callers are proposal-only passes whose
    weights are stop-gradiented (renderer sample_pdf) and whose loss term
    is dropped (coarse_loss_weight 0)."""
    block = _block_for(xt.shape[1], block)
    xt, n, n_blocks = _pad_lanes(xt, block)
    nd = len(params["dW"])
    wdtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
    flat = ([dup_lines(params["lines"], cfg)]
            + list(params["dW"]) + list(params["db"]))
    out = pl.pallas_call(
        functools.partial(_fwd_sigma_kernel, cfg=cfg, nd=nd, wdtype=wdtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((3, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat],
        out_specs=pl.BlockSpec((4, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n_blocks * block), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(xt, *flat)
    return out[:, :n]


def _bwd_kernel(xt_ref, vd_ref, lines_ref, *refs,
                cfg: CPGridConfig, nd: int, nc: int, wdtype):
    """refs: dW, db, cW, cb (params), g (4, B) — then outputs:
    dlines, ddW[nd], ddb[nd], dcW[nc], dcb[nc] (accumulated in VMEM)."""
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
    fwd_dims = (((0,), (0,)), ((), ()))   # (Tl,C)x(Tl,B) -> (C,B)
    acc_dims = (((1,), (1,)), ((), ()))   # (Tl,B)x(C,B) -> (Tl,C)

    # ---- recompute forward, keeping residuals as in-register values ----
    # The per-axis line features u (C, B) AND the (Tl, B) bf16 hat-weight
    # operands are retained for the encoder backward — the weights cost
    # ~sum(Tl)·3·B·2 bytes of VMEM (14 MB at the flagship shape, well under
    # the 96 MB scoped budget) and dropping them meant rebuilding every
    # tent a second time, measured as a double-digit share of step time at
    # the flagship shape (the W build is VPU-bound, not MXU-bound).
    u_all, W_all, enc_parts = [], [], []
    rows = [cfg.level_rows_dup(R) for R in cfg.resolutions]
    for l, R in enumerate(cfg.resolutions):
        Tl = rows[l]
        iota = jax.lax.broadcasted_iota(jnp.int32, (Tl, B), 0).astype(
            jnp.float32
        )
        pos = xx * R
        u, Ws = [], []
        for a in range(3):
            W = _hat_weights(pos[a : a + 1], iota, R, cfg.level_fold(R), wdtype,
                             cfg.fold, fold_salt(l, a), dup=True)
            Ws.append(W)
            u.append(
                jax.lax.dot_general(
                    lines_ref[l, a, :Tl, :].astype(wdtype), W, fwd_dims,
                    preferred_element_type=jnp.float32,
                )
            )
        u_all.append(u)
        W_all.append(Ws)
        enc_parts.append(u[0] * u[1] * u[2])
    enc = jnp.concatenate(enc_parts, axis=0)

    dWv = [w[:] for w in dW]
    dbv = [b[:] for b in db]
    cWv = [w[:] for w in cW]
    cbv = [b[:] for b in cb]
    feat, d_pres = _mlp_fwd_cf(enc, dWv, dbv, wdtype, save_pre=True)
    sigma = _sigma_row(feat)
    h = jnp.concatenate([feat, _sh4_rows(vd_ref[:])], axis=0)
    _, c_pres = _mlp_fwd_cf(h, cWv, cbv, wdtype, save_pre=True)

    # ---- backward ------------------------------------------------------
    g_rgb = g_ref[0:3, :]
    g_sigma = g_ref[3:4, :]
    dh, dcWs, dcbs = _mlp_bwd_cf(g_rgb, c_pres, cWv, wdtype)
    d_feat = dh[: feat.shape[0], :]
    # σ = exp(clip(z0)): route dσ into feat row 0 where unclipped.
    z0 = feat[0:1]
    live = jnp.logical_and(z0 > -15.0, z0 < 15.0)
    dz0 = jnp.where(live, g_sigma * sigma, 0.0)  # (1, B)
    row0 = (
        jax.lax.broadcasted_iota(jnp.int32, d_feat.shape, 0) == 0
    ).astype(d_feat.dtype)
    d_feat = d_feat + dz0 * row0
    d_enc, ddWs, ddbs = _mlp_bwd_cf(d_feat, d_pres, dWv, wdtype)

    for i in range(nc):
        dcW[i][...] += dcWs[i]
        dcb[i][...] += dcbs[i]
    for i in range(nd):
        ddW[i][...] += ddWs[i]
        ddb[i][...] += ddbs[i]

    # ---- encoder backward (as in cp_grid_pallas, channels-first) --------
    for l, R in enumerate(cfg.resolutions):
        u = u_all[l]
        Tl = rows[l]
        g_l = d_enc[l * C : (l + 1) * C, :]  # (C, B)
        others = [u[1] * u[2], u[0] * u[2], u[0] * u[1]]
        for a in range(3):
            grad_u = (g_l * others[a]).astype(wdtype)  # (C, B)
            dlines_ref[l, a, :Tl, :] += jax.lax.dot_general(
                W_all[l][a], grad_u, acc_dims,
                preferred_element_type=jnp.float32,
            )  # (Tl, C) — parameter layout; rows ≥ Tl stay 0


def _block_for(n: int, block: int) -> int:
    """Clamp the point-block width for small inputs: a 1k-point call must
    not pad to a 4096-wide block (4x wasted compute; interpret-mode tests
    would crawl). Lane tiles are 128 wide — round n up to that."""
    return min(block, max(128, -(-n // 128) * 128))


def _pad_lanes(arr, block: int):
    """(rows, N) → (rows, n_blocks*block), returns (arr, N, n_blocks)."""
    n = arr.shape[1]
    n_blocks = -(-n // block)
    pad = n_blocks * block - n
    if pad:
        arr = jnp.pad(arr, ((0, 0), (0, pad)))
    return arr, n, n_blocks


def _flatten_params(params):
    return (
        [params["lines"]]
        + list(params["dW"]) + list(params["db"])
        + list(params["cW"]) + list(params["cb"])
    )


def dup_lines(lines: jnp.ndarray, cfg: CPGridConfig) -> jnp.ndarray:
    """(L,3,T,C) parameter tables → (L,3,dup_rows,C) kernel operand.

    For each periodic folded level, materializes the wrap row: row F (its
    fold modulus) becomes a copy of row 0, letting the kernel tent stay
    plain (``_hat_weights(dup=True)``). Rows of level l at indices > F are
    zeroed copies/padding the tent never weights. O(L·3·T·C) — trivial next
    to the kernel itself."""
    if cfg.fold != "periodic":
        return lines
    T, Tp = cfg.table_size, cfg.dup_rows
    out = lines
    if Tp > T:
        out = jnp.pad(lines, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    for l, R in enumerate(cfg.resolutions):
        F = cfg.level_fold(R)
        if F:
            out = out.at[l, :, F, :].set(lines[l, :, 0, :])
    return out


def fold_dlines(dl: jnp.ndarray, cfg: CPGridConfig) -> jnp.ndarray:
    """Inverse of :func:`dup_lines` for cotangents: each folded level's
    dup-row gradient (row F) folds into row 0, then the padding is sliced
    off and in-table dup rows are zeroed (row F < T is a dead parameter row
    for its own level — it must not receive the wrap gradient)."""
    if cfg.fold != "periodic":
        return dl
    T = cfg.table_size
    for l, R in enumerate(cfg.resolutions):
        F = cfg.level_fold(R)
        if F:
            dl = dl.at[l, :, 0, :].add(dl[l, :, F, :])
            if F < T:
                dl = dl.at[l, :, F, :].set(0.0)
    return dl[:, :, :T, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def ngp_fused_apply_cf(
    params: dict,
    xt: jnp.ndarray,
    vdt: jnp.ndarray,
    cfg: CPGridConfig,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
):
    """Fused point pipeline, channels-first IO.

    ``params``: {"lines": (L,3,T,C), "dW": [(in,out)..], "db": [(out,1)..],
    "cW": [..], "cb": [..]}. ``xt``: (3, N) unit-cube points; ``vdt``:
    (3, N) unit view directions (SH evaluated in-kernel). Returns (4, N):
    rows 0-2 rgb logits, row 3 σ.
    """
    return _fused_forward_cf(params, xt, vdt, cfg, block, interpret)


def _fused_forward_cf(params, xt, vdt, cfg, block, interpret):
    block = _block_for(xt.shape[1], block)
    xt, n, n_blocks = _pad_lanes(xt, block)
    vdt, _, _ = _pad_lanes(vdt, block)
    nd, nc = len(params["dW"]), len(params["cW"])
    wdtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32

    flat = _flatten_params(params)
    flat[0] = dup_lines(flat[0], cfg)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg, nd=nd, nc=nc, wdtype=wdtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((3, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat],
        out_specs=pl.BlockSpec((4, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n_blocks * block), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(xt, vdt, *flat)
    return out[:, :n]


def _fused_fwd_cf(params, xt, vdt, cfg, block, interpret):
    return _fused_forward_cf(params, xt, vdt, cfg, block, interpret), (
        params, xt, vdt
    )


def _fused_bwd_cf(cfg, block, interpret, res, g):
    params, xt, vdt = res
    block = _block_for(xt.shape[1], block)
    xt, n, n_blocks = _pad_lanes(xt, block)
    vdt, _, _ = _pad_lanes(vdt, block)
    gf, _, _ = _pad_lanes(g, block)
    nd, nc = len(params["dW"]), len(params["cW"])
    wdtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32

    flat = _flatten_params(params)
    flat[0] = dup_lines(flat[0], cfg)
    out_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in flat]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg, nd=nd, nc=nc, wdtype=wdtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((3, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat]
        + [pl.BlockSpec((4, block), lambda i: (0, i),
                        memory_space=pltpu.VMEM)],
        # Accumulators: same block every grid step (sequential on TPU).
        out_specs=[
            pl.BlockSpec(s.shape, lambda i, _s=s: (0,) * len(_s.shape),
                         memory_space=pltpu.VMEM)
            for s in out_shapes
        ],
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(xt, vdt, *flat, gf)

    d_params = {
        "lines": fold_dlines(outs[0], cfg),
        "dW": list(outs[1 : 1 + nd]),
        "db": list(outs[1 + nd : 1 + 2 * nd]),
        "cW": list(outs[1 + 2 * nd : 1 + 2 * nd + nc]),
        "cb": list(outs[1 + 2 * nd + nc : 1 + 2 * nd + 2 * nc]),
    }
    return d_params, jnp.zeros((3, n), xt.dtype), jnp.zeros((3, n), vdt.dtype)


ngp_fused_apply_cf.defvjp(_fused_fwd_cf, _fused_bwd_cf)


# ---------------------------------------------------------------------------
# Fully-fused FINE TRAIN pass: forward + per-ray compositing + MSE + backward
# in ONE kernel invocation.
#
# The round-4 trace put the fine backward Pallas call at 2.51 ms (49% of the
# 5.13 ms step), the fine forward at 0.87 ms, and ~0.7 ms of XLA compositing/
# loss glue around them. The backward already recomputes the whole forward
# (activations never touch HBM), so running the *primal* forward as a
# separate kernel + XLA compositing bought nothing but a second tent
# construction, a second encoder pass, and a (4, N) HBM round trip. Rays are
# independent, so a block of WHOLE RAYS can composite, take the MSE against
# its target pixels, and backprop — all in VMEM.
#
# Layout contract: the point block is RAYS_PER_BLOCK rays × S samples,
# ordered SAMPLE-MAJOR within the block (lane = s*RB + r), so "sample s of
# every ray in the block" is a native 128-lane slice. The caller builds
# points/dirs/dists in this order (see NGPEngine._fused_objective_inputs).
#
# Reference counterpart: instant-ngp's fused train step
# (testbed_nerf train loop — SURVEY.md §3.3) which likewise never
# materializes per-sample activations between network and compositing.
# ---------------------------------------------------------------------------

RAYS_PER_BLOCK = 128


def _split_train_refs(refs, nd, nc):
    """Common ref unpacking for the fused train kernels: params (dW, db,
    cW, cb) then outputs (dlines, ddW, ddb, dcW, dcb, err, maps, *rest)."""
    n_params = 2 * nd + 2 * nc
    dW = [refs[i] for i in range(nd)]
    db = [refs[nd + i] for i in range(nd)]
    cW = [refs[2 * nd + i] for i in range(nc)]
    cb = [refs[2 * nd + nc + i] for i in range(nc)]
    outs = refs[n_params:]
    return dW, db, cW, cb, outs


def _fine_stage(xt, vd, dists, tgt, lines_ref, dW, db, cW, cb,
                dlines_ref, ddW, ddb, dcW, dcb, err_ref, map_ref,
                cfg: CPGridConfig, nd: int, nc: int, wdtype, S: int,
                white_bg: bool, inv_denom: float):
    """Fine pass on in-VMEM values: forward → per-ray compositing → MSE →
    full backward, accumulating parameter grads. ``xt``/``vd`` (3, B) and
    ``dists`` (1, B) are sample-major (lane = s·RB + r); ``tgt`` (3, RB)."""
    RB = RAYS_PER_BLOCK
    B = xt.shape[1]
    xx = jnp.clip(xt, 0.0, 1.0)
    fwd_dims = (((0,), (0,)), ((), ()))
    acc_dims = (((1,), (1,)), ((), ()))

    # ---- forward (identical math to _bwd_kernel's recompute, but here it
    # IS the primal — residuals stay in VMEM for the in-kernel backward) ----
    u_all, W_all, enc_parts = [], [], []
    rows = [cfg.level_rows_dup(R) for R in cfg.resolutions]
    for l, R in enumerate(cfg.resolutions):
        Tl = rows[l]
        iota = jax.lax.broadcasted_iota(jnp.int32, (Tl, B), 0).astype(
            jnp.float32
        )
        pos = xx * R
        u, Ws = [], []
        for a in range(3):
            W = _hat_weights(pos[a : a + 1], iota, R, cfg.level_fold(R), wdtype,
                             cfg.fold, fold_salt(l, a), dup=True)
            Ws.append(W)
            u.append(
                jax.lax.dot_general(
                    lines_ref[l, a, :Tl, :].astype(wdtype), W, fwd_dims,
                    preferred_element_type=jnp.float32,
                )
            )
        u_all.append(u)
        W_all.append(Ws)
        enc_parts.append(u[0] * u[1] * u[2])
    enc = jnp.concatenate(enc_parts, axis=0)

    dWv = [w[:] for w in dW]
    dbv = [b[:] for b in db]
    cWv = [w[:] for w in cW]
    cbv = [b[:] for b in cb]
    feat, d_pres = _mlp_fwd_cf(enc, dWv, dbv, wdtype, save_pre=True)
    sigma = _sigma_row(feat)  # (1, B)
    h = jnp.concatenate([feat, _sh4_rows(vd)], axis=0)
    rgb_l, c_pres = _mlp_fwd_cf(h, cWv, cbv, wdtype, save_pre=True)
    sig = jax.nn.sigmoid(rgb_l)  # (3, B)

    # ---- per-ray compositing + MSE (S native 128-lane slices) ------------
    alpha = 1.0 - jnp.exp(-sigma * dists)  # σ arrives exp-activated ≥ 0
    trans = jnp.ones((1, RB), jnp.float32)
    rgb_map = jnp.zeros((3, RB), jnp.float32)
    acc = jnp.zeros((1, RB), jnp.float32)
    Ts, ws = [], []
    for s in range(S):
        sl = slice(s * RB, (s + 1) * RB)
        a_s = alpha[:, sl]
        w_s = a_s * trans
        rgb_map = rgb_map + w_s * sig[:, sl]
        acc = acc + w_s
        Ts.append(trans)
        ws.append(w_s)
        trans = trans * (1.0 - a_s + 1e-10)
    if white_bg:
        rgb_map = rgb_map + (1.0 - acc)
    diff = rgb_map - tgt  # (3, RB)
    err_ref[...] = jnp.sum(diff * diff, axis=0, keepdims=True)
    map_ref[0:3, :] = rgb_map
    map_ref[3:4, :] = acc
    gmap = (2.0 * inv_denom) * diff  # dL/d(rgb_map), (3, RB)

    # ---- compositing backward --------------------------------------------
    # rgb_map_c = Σ_s w_s·sig_c,s [+ white·(1 − Σ_s w_s)]
    #   ⇒ dL/dw_s = Σ_c gmap_c·(sig_c,s − white)
    # w_s = α_s·T_s, T_{s+1} = T_s·(1−α_s+ε). Division-free reverse
    # recurrence (the suffix/(1−α+ε) form overflows when α → 1):
    #   dL/dα_s = (dw_s − dT_{s+1})·T_s
    #   dT_s    = dw_s·α_s + dT_{s+1}·(1−α_s+ε),   dT_S = 0
    # α = 1−exp(−σ·d) ⇒ dα/dσ = (1−α)·d.
    gsum = jnp.sum(gmap, axis=0, keepdims=True)  # (1, RB)
    dw = []
    dsig_sl = [None] * S
    for s in range(S):
        sl = slice(s * RB, (s + 1) * RB)
        t1 = jnp.sum(gmap * sig[:, sl], axis=0, keepdims=True)
        if white_bg:
            t1 = t1 - gsum
        dw.append(t1)
        dsig_sl[s] = gmap * ws[s]  # (3, RB)
    dT = jnp.zeros((1, RB), jnp.float32)
    dsigma_sl = [None] * S
    for s in reversed(range(S)):
        sl = slice(s * RB, (s + 1) * RB)
        a_s = alpha[:, sl]
        da_s = (dw[s] - dT) * Ts[s]
        dT = dw[s] * a_s + dT * (1.0 - a_s + 1e-10)
        dsigma_sl[s] = da_s * (1.0 - a_s) * dists[:, sl]
    g_sig = jnp.concatenate(dsig_sl, axis=1)  # (3, B)
    g_rgb = g_sig * sig * (1.0 - sig)  # sigmoid backward
    g_sigma = jnp.concatenate(dsigma_sl, axis=1)  # (1, B)

    # ---- MLP + encoder backward (same structure as _bwd_kernel) ----------
    dh, dcWs, dcbs = _mlp_bwd_cf(g_rgb, c_pres, cWv, wdtype)
    d_feat = dh[: feat.shape[0], :]
    z0 = feat[0:1]
    live = jnp.logical_and(z0 > -15.0, z0 < 15.0)
    dz0 = jnp.where(live, g_sigma * sigma, 0.0)
    row0 = (
        jax.lax.broadcasted_iota(jnp.int32, d_feat.shape, 0) == 0
    ).astype(d_feat.dtype)
    d_feat = d_feat + dz0 * row0
    d_enc, ddWs, ddbs = _mlp_bwd_cf(d_feat, d_pres, dWv, wdtype)

    for i in range(nc):
        dcW[i][...] += dcWs[i]
        dcb[i][...] += dcbs[i]
    for i in range(nd):
        ddW[i][...] += ddWs[i]
        ddb[i][...] += ddbs[i]

    C = cfg.n_components
    for l, R in enumerate(cfg.resolutions):
        u = u_all[l]
        Tl = rows[l]
        g_l = d_enc[l * C : (l + 1) * C, :]
        others = [u[1] * u[2], u[0] * u[2], u[0] * u[1]]
        for a in range(3):
            grad_u = (g_l * others[a]).astype(wdtype)
            dlines_ref[l, a, :Tl, :] += jax.lax.dot_general(
                W_all[l][a], grad_u, acc_dims,
                preferred_element_type=jnp.float32,
            )


def _train_kernel(xt_ref, vd_ref, dist_ref, tgt_ref, lines_ref, *refs,
                  cfg: CPGridConfig, nd: int, nc: int, wdtype, S: int,
                  white_bg: bool, inv_denom: float):
    """Fine-only fused train kernel: the caller supplies points/dirs/dists;
    this unpacks refs and runs :func:`_fine_stage`."""
    dW, db, cW, cb, outs = _split_train_refs(refs, nd, nc)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in outs[: 1 + 2 * nd + 2 * nc]:
            r[...] = jnp.zeros_like(r)

    _fine_stage(
        xt_ref[:], vd_ref[:], dist_ref[:], tgt_ref[:], lines_ref,
        dW, db, cW, cb,
        outs[0], outs[1 : 1 + nd], outs[1 + nd : 1 + 2 * nd],
        outs[1 + 2 * nd : 1 + 2 * nd + nc],
        outs[1 + 2 * nd + nc : 1 + 2 * nd + 2 * nc],
        outs[1 + 2 * nd + 2 * nc], outs[2 + 2 * nd + 2 * nc],
        cfg=cfg, nd=nd, nc=nc, wdtype=wdtype, S=S, white_bg=white_bg,
        inv_denom=inv_denom,
    )


def ngp_fused_train_cf(params, xt, vdt, dists, tgt_cf, cfg: CPGridConfig,
                       S: int, white_bg: bool, inv_denom: float,
                       interpret: bool = False):
    """One-invocation fused fine train pass.

    Args:
      params: same dict as :func:`ngp_fused_apply_cf`.
      xt/vdt: (3, N) unit-cube points / unit view dirs, N = nb·S·128,
        block-sample-major (lane index = block·S·128 + s·128 + r).
      dists: (1, N) per-sample compositing intervals (already × ‖rays_d‖,
        1e10 sentinel at s = S−1), same layout.
      tgt_cf: (3, R) target pixels, R = nb·128 (ray-major).
      S: samples per ray; white_bg: compose onto white; inv_denom:
        dL/d(rgb_map) scale = 1/(3·R_total_real) for a mean-MSE loss.

    Returns (err (1, R) per-ray squared error, maps (4, R) rgb_map+acc,
    d_params dict mirroring ``params`` — ``lines`` cotangent still in
    dup-row layout; callers apply :func:`fold_dlines`). NOT differentiable —
    it IS the gradient computation.
    """
    RB = RAYS_PER_BLOCK
    n = xt.shape[1]
    if n % (S * RB):
        raise ValueError(f"N={n} must be a multiple of S·{RB}={S * RB}")
    n_blocks = n // (S * RB)
    n_rays = n_blocks * RB
    if tgt_cf.shape != (3, n_rays):
        raise ValueError(f"tgt_cf {tgt_cf.shape} != (3, {n_rays})")
    nd, nc = len(params["dW"]), len(params["cW"])
    wdtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
    block = S * RB

    flat = _flatten_params(params)
    flat[0] = dup_lines(flat[0], cfg)
    acc_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in flat]
    out_shapes = acc_shapes + [
        jax.ShapeDtypeStruct((1, n_rays), jnp.float32),
        jax.ShapeDtypeStruct((4, n_rays), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec(s.shape, lambda i, _s=s: (0,) * len(_s.shape),
                     memory_space=pltpu.VMEM)
        for s in acc_shapes
    ] + [
        pl.BlockSpec((1, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((4, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    outs = pl.pallas_call(
        functools.partial(_train_kernel, cfg=cfg, nd=nd, nc=nc, wdtype=wdtype,
                          S=S, white_bg=white_bg, inv_denom=inv_denom),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((3, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(xt, vdt, dists, tgt_cf, *flat)

    d_params = {
        "lines": outs[0],
        "dW": list(outs[1 : 1 + nd]),
        "db": list(outs[1 + nd : 1 + 2 * nd]),
        "cW": list(outs[1 + 2 * nd : 1 + 2 * nd + nc]),
        "cb": list(outs[1 + 2 * nd + nc : 1 + 2 * nd + 2 * nc]),
    }
    err = outs[1 + 2 * nd + 2 * nc]
    maps = outs[2 + 2 * nd + 2 * nc]
    return err, maps, d_params


# ---------------------------------------------------------------------------
# WHOLE-STEP fused train kernel: hull proposal → inverse-CDF coarse depths →
# σ-coarse network pass → compositing weights → inverse-CDF fine depths →
# fine forward + compositing + MSE + backward, all per 128-ray block in ONE
# invocation. The only XLA work left in the train step is the ray-batch
# slice, (3, R) transposes, the occupancy pair-projections (3 max-reduces),
# two stratified-uniform draws, and the optimizer.
#
# Mirrors ops/occupancy.occupancy_sample (hull mode) + ops/sampling
# .sample_pdf + renderer coarse compositing EXACTLY — parity is tested
# against those functions (tests/test_fused_train.py).
# ---------------------------------------------------------------------------


def _cdf_rows(w_rows):
    """List of M (1, RB) unnormalized weights → (CDF (M+1, RB), same
    +1e-5/normalize semantics as ops/sampling.sample_pdf."""
    w = [r + 1e-5 for r in w_rows]
    tot = w[0]
    for r in w[1:]:
        tot = tot + r
    rows = [jnp.zeros_like(w[0])]
    for r in w:
        rows.append(rows[-1] + r / tot)
    return jnp.concatenate(rows, axis=0)


def _inv_cdf_rows(cdf, edges, u, n_out):
    """Inverse-transform sampling, ops/sampling.sample_pdf math on sublane-
    stacked rows: ``cdf`` (M+1, RB), ``edges`` (M+1, RB) or (M+1, 1),
    ``u`` (n_out, RB) sorted per ray → list of n_out (1, RB) depths."""
    M1, RB = cdf.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (M1, RB), 0)
    out = []
    for s in range(n_out):
        us = u[s : s + 1]
        cnt = jnp.sum((cdf <= us).astype(jnp.int32), axis=0, keepdims=True)
        inds = jnp.clip(cnt, 1, M1 - 1)
        ob = (iota == (inds - 1)).astype(jnp.float32)
        oa = (iota == inds).astype(jnp.float32)
        cdf_lo = jnp.sum(cdf * ob, axis=0, keepdims=True)
        cdf_hi = jnp.sum(cdf * oa, axis=0, keepdims=True)
        e_lo = jnp.sum(edges * ob, axis=0, keepdims=True)
        e_hi = jnp.sum(edges * oa, axis=0, keepdims=True)
        den = cdf_hi - cdf_lo
        den = jnp.where(den < 1e-5, 1.0, den)
        frac = (us - cdf_lo) / den
        out.append(e_lo + frac * (e_hi - e_lo))
    return out


def _train_full_kernel(o_ref, d_ref, vd_ref, tgt_ref, uc_ref, uf_ref,
                       proj2_ref, lines_ref, *refs,
                       cfg: CPGridConfig, nd: int, nc: int, wdtype,
                       S: int, Sc: int, NB: int, Rg: int,
                       white_bg: bool, inv_denom: float,
                       near: float, far: float, inv_bound2: float,
                       occ_floor: float):
    """Whole-step kernel. Inputs per block: rays o/d/viewdirs/targets
    (3, RB), coarse/fine inverse-CDF uniforms (Sc, RB)/(S, RB), occupancy
    pair-projections (3, Rg, Rg) resident. Outputs as _train_kernel plus
    err_c (1, RB) — the coarse background-composite squared error."""
    RB = RAYS_PER_BLOCK
    dW, db, cW, cb, outs = _split_train_refs(refs, nd, nc)
    # Trailing refs are the VMEM scratch buffers (see scratch_shapes in
    # ngp_fused_train_full_cf). Per-sample rows produced by the inverse-CDF
    # sublane reductions carry arbitrary sublane offsets; Mosaic refuses to
    # lane-concatenate mismatched-offset vectors ("result/input offset
    # mismatch on non-concat dimension"), so sample-major (·, S·RB) arrays
    # are assembled by STORING each row into scratch (stores re-lay-out),
    # then reading the whole buffer back.
    sc_ptsc, sc_ptsf, sc_distf = outs[-3:]
    outs = outs[:-3]
    errc_ref = outs[3 + 2 * nd + 2 * nc]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in outs[: 1 + 2 * nd + 2 * nc]:
            r[...] = jnp.zeros_like(r)

    o = o_ref[:]
    d = d_ref[:]
    d_norm = jnp.sqrt(jnp.sum(d * d, axis=0, keepdims=True))  # (1, RB)

    # ---- stage A: hull-proposal weights on NB uniform bins ---------------
    # (occupancy_sample: bins = linspace(near, far, NB+1), occ at bin mids
    # via the visual-hull pair-projection min, normalized per ray + floor.)
    step = (far - near) / NB
    # o/d rows are plain ref loads (sublane offset 0), so this lane-concat
    # is layout-uniform — no scratch needed (unlike the CDF-derived rows).
    pb = jnp.concatenate(
        [o + (near + (b + 0.5) * step) * d for b in range(NB)], axis=1
    )  # (3, NB·RB) sample-major
    unit = jnp.clip(pb * inv_bound2 + 0.5, 0.0, 1.0)
    posg = jnp.floor(jnp.clip(unit * Rg, 0.0, Rg - 1.0))
    giota = jax.lax.broadcasted_iota(
        jnp.int32, (Rg, NB * RB), 0
    ).astype(jnp.float32)
    ox = (jnp.abs(posg[0:1] - giota) < 0.5).astype(jnp.bfloat16)
    oy = (jnp.abs(posg[1:2] - giota) < 0.5).astype(jnp.bfloat16)
    oz = (jnp.abs(posg[2:3] - giota) < 0.5).astype(jnp.bfloat16)
    ab = (((1,), (0,)), ((), ()))

    def bilinear(oa, P, ob):
        m = jax.lax.dot_general(
            P.astype(jnp.bfloat16), ob, ab,
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(oa.astype(jnp.float32) * m, axis=0, keepdims=True)

    occ = jnp.minimum(
        bilinear(ox, proj2_ref[0], oy),
        jnp.minimum(bilinear(ox, proj2_ref[1], oz),
                    bilinear(oy, proj2_ref[2], oz)),
    )  # (1, NB·RB)
    occ_rows = [occ[:, b * RB : (b + 1) * RB] for b in range(NB)]
    occ_max = occ_rows[0]
    for r in occ_rows[1:]:
        occ_max = jnp.maximum(occ_max, r)
    w_rows = [r / (occ_max + 1e-9) + occ_floor for r in occ_rows]

    # ---- stage B: inverse-CDF → coarse depths ----------------------------
    edges_c = jnp.concatenate(
        [jnp.full((1, RB), near + b * step, jnp.float32)
         for b in range(NB + 1)], axis=0,
    )  # (NB+1, RB)
    z_c = _inv_cdf_rows(_cdf_rows(w_rows), edges_c, uc_ref[:], Sc)

    # ---- stage C: σ-coarse pass + compositing weights --------------------
    for s in range(Sc):
        sc_ptsc[:, s * RB : (s + 1) * RB] = o + z_c[s] * d
    xt_c = jnp.clip(sc_ptsc[:] * inv_bound2 + 0.5, 0.0, 1.0)
    enc_c = _encode_block_cf(xt_c, lines_ref, cfg, wdtype)
    feat_c, _ = _mlp_fwd_cf(enc_c, [w[:] for w in dW], [b[:] for b in db],
                            wdtype)
    sigma_c = _sigma_row(feat_c)  # (1, Sc·RB)
    dists_c = [
        (z_c[s + 1] - z_c[s]) * d_norm for s in range(Sc - 1)
    ] + [jnp.full((1, RB), 1e10, jnp.float32) * d_norm]
    trans = jnp.ones((1, RB), jnp.float32)
    acc_c = jnp.zeros((1, RB), jnp.float32)
    cw_rows = []
    for s in range(Sc):
        a_s = 1.0 - jnp.exp(-sigma_c[:, s * RB : (s + 1) * RB] * dists_c[s])
        w_s = a_s * trans
        acc_c = acc_c + w_s
        cw_rows.append(w_s)
        trans = trans * (1.0 - a_s + 1e-10)
    # Coarse metric: the σ-only pass has zero rgb logits → sigmoid = 0.5
    # gray composite (+ white background), exactly raw2outputs_cf's output.
    v = 0.5 * acc_c + ((1.0 - acc_c) if white_bg else 0.0)
    dv = v - tgt_ref[:]
    errc_ref[...] = jnp.sum(dv * dv, axis=0, keepdims=True)

    # ---- stage D: inverse-CDF → fine depths (hierarchical_sample) --------
    # bins = coarse-depth midpoints, weights = interior coarse weights.
    mids = [0.5 * (z_c[s] + z_c[s + 1]) for s in range(Sc - 1)]
    edges_f = jnp.concatenate(mids, axis=0)  # (Sc-1, RB)
    z_f = _inv_cdf_rows(
        _cdf_rows(cw_rows[1:-1]), edges_f, uf_ref[:], S
    )

    # ---- stage E: fine forward + compositing + MSE + backward ------------
    vd_b = vd_ref[:]
    vdt = jnp.concatenate([vd_b] * S, axis=1)  # offset-uniform pieces
    for s in range(S):
        sl = slice(s * RB, (s + 1) * RB)
        sc_ptsf[:, sl] = o + z_f[s] * d
        sc_distf[:, sl] = (
            (z_f[s + 1] - z_f[s]) * d_norm if s < S - 1
            else jnp.full((1, RB), 1e10, jnp.float32) * d_norm
        )
    xt_f = jnp.clip(sc_ptsf[:] * inv_bound2 + 0.5, 0.0, 1.0)
    _fine_stage(
        xt_f, vdt, sc_distf[:], tgt_ref[:], lines_ref, dW, db, cW, cb,
        outs[0], outs[1 : 1 + nd], outs[1 + nd : 1 + 2 * nd],
        outs[1 + 2 * nd : 1 + 2 * nd + nc],
        outs[1 + 2 * nd + nc : 1 + 2 * nd + 2 * nc],
        outs[1 + 2 * nd + 2 * nc], outs[2 + 2 * nd + 2 * nc],
        cfg=cfg, nd=nd, nc=nc, wdtype=wdtype, S=S, white_bg=white_bg,
        inv_denom=inv_denom,
    )


def ngp_fused_train_full_cf(params, o_cf, d_cf, vd_cf, tgt_cf, u_coarse,
                            u_fine, proj2, cfg: CPGridConfig,
                            S: int, Sc: int, num_bins: int,
                            white_bg: bool, inv_denom: float,
                            near: float, far: float, bound: float,
                            occ_floor: float, interpret: bool = False):
    """Whole-train-step fused kernel (see _train_full_kernel).

    Args:
      o_cf/d_cf/vd_cf/tgt_cf: (3, R) rays origin/direction/viewdir/target,
        R a multiple of 128.
      u_coarse/u_fine: (Sc, R)/(S, R) sorted-per-ray inverse-CDF uniforms
        (the sample_pdf stratified_u/deterministic draws, transposed).
      proj2: (3, Rg, Rg) occupancy pair-projections (ops/occupancy
        .pair_projections).
      near/far/bound: scene geometry statics; occ_floor: proposal floor.

    Returns (err (1, R), maps (4, R), err_c (1, R), d_params). Linear
    [-bound, bound]³ → unit-cube mapping only (contracted scenes use the
    two-kernel path).
    """
    RB = RAYS_PER_BLOCK
    n_rays = o_cf.shape[1]
    if n_rays % RB:
        raise ValueError(f"R={n_rays} must be a multiple of {RB}")
    n_blocks = n_rays // RB
    nd, nc = len(params["dW"]), len(params["cW"])
    wdtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
    Rg = proj2.shape[-1]

    flat = _flatten_params(params)
    flat[0] = dup_lines(flat[0], cfg)
    acc_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in flat]
    out_shapes = acc_shapes + [
        jax.ShapeDtypeStruct((1, n_rays), jnp.float32),
        jax.ShapeDtypeStruct((4, n_rays), jnp.float32),
        jax.ShapeDtypeStruct((1, n_rays), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec(s.shape, lambda i, _s=s: (0,) * len(_s.shape),
                     memory_space=pltpu.VMEM)
        for s in acc_shapes
    ] + [
        pl.BlockSpec((1, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((4, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    ray_spec = pl.BlockSpec((3, RB), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(
            _train_full_kernel, cfg=cfg, nd=nd, nc=nc, wdtype=wdtype,
            S=S, Sc=Sc, NB=num_bins, Rg=Rg, white_bg=white_bg,
            inv_denom=inv_denom, near=float(near), far=float(far),
            inv_bound2=1.0 / (2.0 * float(bound)),
            occ_floor=float(occ_floor),
        ),
        grid=(n_blocks,),
        in_specs=[
            ray_spec, ray_spec, ray_spec, ray_spec,
            pl.BlockSpec((Sc, RB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, RB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((3, Sc * RB), jnp.float32),  # coarse points
            pltpu.VMEM((3, S * RB), jnp.float32),   # fine points
            pltpu.VMEM((1, S * RB), jnp.float32),   # fine dists
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(o_cf, d_cf, vd_cf, tgt_cf, u_coarse, u_fine, proj2, *flat)

    d_params = {
        "lines": outs[0],
        "dW": list(outs[1 : 1 + nd]),
        "db": list(outs[1 + nd : 1 + 2 * nd]),
        "cW": list(outs[1 + 2 * nd : 1 + 2 * nd + nc]),
        "cb": list(outs[1 + 2 * nd + nc : 1 + 2 * nd + 2 * nc]),
    }
    base = 1 + 2 * nd + 2 * nc
    return outs[base], outs[base + 1], outs[base + 2], d_params


def ngp_fused_apply(params, x, vd, cfg, block: int = DEFAULT_BLOCK,
                    interpret: bool = False):
    """Compatibility wrapper over :func:`ngp_fused_apply_cf` with
    channels-LAST IO: ``x``/``vd`` (..., 3) → (rgb logits (..., 3),
    σ (...,)). The hot training path calls the cf variant directly
    (rendering/renderer.py) — this wrapper's transposes are for tests and
    non-critical callers."""
    orig = x.shape[:-1]
    xt = x.reshape(-1, 3).T
    vdt = vd.reshape(-1, 3).T
    out = ngp_fused_apply_cf(params, xt, vdt, cfg, block, interpret)
    rgb = out[0:3, :].T.reshape(*orig, 3)
    sigma = out[3, :].reshape(orig)
    return rgb, sigma
