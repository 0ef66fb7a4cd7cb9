"""Fully-fused classic-NeRF point pipeline: one Pallas TPU kernel for
γ-encode → xyz trunk → {σ head, feature → direction branch → rgb},
forward and backward — channels-first.

The classic engine's TPU-native counterpart of ops/ngp_fused_pallas.py
(same design: activations live as (features, points) with the point block
in lanes; MLPs run transposed off natural (in, out) weight layouts; the
backward kernel recomputes the forward and accumulates parameter
gradients in VMEM across sequential grid steps). The sinusoidal encoding
(ops/positional_encoding.py, reference fork semantics — SURVEY.md §2.2)
is evaluated IN-KERNEL as (1, B)-row sin/cos on the VPU, so the (N, 63)
feature array never exists in HBM.

Output contract: (4, N) with rgb LOGIT rows 0-2 and row 3 = RAW
(pre-activation) σ — exactly what rendering raw2outputs/_cf expects from
the classic model (noise is added pre-relu there, the classic
radiance_field_noise_std semantics).

Scope (callers fall back to the flax module otherwise — see
train/loop.py::ClassicNerf.cf_apply_fns):
  - use_viewdirs=True (the reference configs' path);
  - trunk depth small enough that the skip concat never fires
    (trunk layer i concatenates γ(xyz) when i % skip_connect_every == 0
    and i > 0; the reference checkpoints' 4-layer trunks never hit it).

GRADIENT CONTRACT (same as ngp_fused_apply_cf): exact cotangents for all
weights/biases; ZERO cotangents for positions and view directions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.flexible_nerf import FlexibleNeRFConfig
from .ngp_fused_pallas import VMEM_LIMIT, _block_for, _pad_lanes

DEFAULT_BLOCK = 4096


def fused_supported(cfg: FlexibleNeRFConfig) -> bool:
    """True when the fused kernel implements this config exactly.

    bf16 runs through 64-output-sublane chunked dots (see the note above
    _dot_in) — the Mosaic wide-bf16-dot limitation is worked around, not
    hit."""
    skip_fires = any(
        i % cfg.skip_connect_every == 0 and i > 0
        for i in range(cfg.trunk_depth - 1)
    )
    return cfg.use_viewdirs and not skip_fires


def _pe_rows(xt, num_freqs: int, include_input: bool, log_sampling: bool):
    """(3, B) → (encoding_dim, B): channels-first mirror of
    ops/positional_encoding.positional_encoding (same row order: raw input
    first, then per-frequency [sin(f·x);sin(f·y);sin(f·z);cos(...)])."""
    rows = [xt] if include_input else []
    if num_freqs:
        if log_sampling:
            freqs = [2.0**k for k in range(num_freqs)]
        else:
            lo, hi = 1.0, 2.0 ** (num_freqs - 1)
            freqs = [
                lo + (hi - lo) * k / max(num_freqs - 1, 1)
                for k in range(num_freqs)
            ]
        for f in freqs:
            xb = xt * f
            rows.append(jnp.sin(xb))
            rows.append(jnp.cos(xb))
    return jnp.concatenate(rows, axis=0)


# Mosaic on v5e rejects bf16 dot_generals with >64 OUTPUT sublanes (f32
# accumulators trip a 'vector.broadcast' element-type verifier error;
# bf16 accumulators an invalid tpu.matmul), and ALSO bf16 dots whose
# contraction dim is sub-tile (< 16, e.g. the 3-row rgb / 1-row sigma head
# cotangents). 64-out chunks are the proven wide shape — BUT lane-slicing
# a loaded VALUE gets re-merged by the canonicalizer into the illegal wide
# dot, while slicing the REF (a subview load) or sublane-slicing a value
# survives (probed directly on v5e). So: bf16 wide dots run as chunked
# loads/slices below, tiny-dim dots stay f32 (their FLOPs are negligible),
# f32 takes the plain single dot. ``W`` may be a pallas ref or a value.


def _loadW(W):
    # Full load for a ref; identity slice for an already-loaded value.
    return W[...]


def _dot_in(W, h, wdtype):
    """(in, out) × (in, B) → (out, B) f32, contracting `in` (sublanes
    both). bf16 with out > 64: chunked over REF lane slices."""
    dims = (((0,), (0,)), ((), ()))
    out = W.shape[1]
    if out < 16:                   # sub-tile output sublanes: stay f32
        wdtype = jnp.float32
    hc = h.astype(wdtype)
    if wdtype == jnp.bfloat16 and out > 64:
        return jnp.concatenate(
            [
                jax.lax.dot_general(
                    W[:, j:min(j + 64, out)].astype(wdtype), hc, dims,
                    preferred_element_type=jnp.float32,
                )
                for j in range(0, out, 64)
            ],
            axis=0,
        )
    return jax.lax.dot_general(
        _loadW(W).astype(wdtype), hc, dims,
        preferred_element_type=jnp.float32,
    )


def _dot_out(W, g, wdtype):
    """(in, out) × (out, B) → (in, B), contracting `out` (backprop).
    bf16 with in > 64: chunked over REF sublane slices."""
    dims = (((1,), (0,)), ((), ()))
    n_in = W.shape[0]
    if W.shape[1] < 16:            # sub-tile contraction dim: stay f32
        wdtype = jnp.float32
    gc = g.astype(wdtype)
    if wdtype == jnp.bfloat16 and n_in > 64:
        return jnp.concatenate(
            [
                jax.lax.dot_general(
                    W[i:min(i + 64, n_in), :].astype(wdtype), gc, dims,
                    preferred_element_type=jnp.float32,
                )
                for i in range(0, n_in, 64)
            ],
            axis=0,
        )
    return jax.lax.dot_general(
        _loadW(W).astype(wdtype), gc, dims,
        preferred_element_type=jnp.float32,
    )


def _dot_acc(inp, g, wdtype):
    """(in, B) × (out, B) → (in, out), contracting the lane (batch) dim.
    bf16 with in > 64: chunked over VALUE sublane slices of ``inp``."""
    dims = (((1,), (1,)), ((), ()))
    n_in = inp.shape[0]
    if g.shape[0] < 16:            # sub-tile output lanes: stay f32
        wdtype = jnp.float32
    gc = g.astype(wdtype)
    if wdtype == jnp.bfloat16 and n_in > 64:
        return jnp.concatenate(
            [
                jax.lax.dot_general(
                    inp[i:min(i + 64, n_in), :].astype(wdtype), gc, dims,
                    preferred_element_type=jnp.float32,
                )
                for i in range(0, n_in, 64)
            ],
            axis=0,
        )
    return jax.lax.dot_general(
        inp.astype(wdtype), gc, dims, preferred_element_type=jnp.float32
    )


def _pad_rows(a, rows: int):
    """Zero-pad axis 0 of (r, B) / (r, out) up to ``rows`` (sublane-tile
    alignment: Mosaic mis-lowers bf16 dot_generals whose contraction dim is
    not a multiple of 8 — padded zero rows contribute exactly 0)."""
    return a if a.shape[0] == rows else jnp.pad(
        a, ((0, rows - a.shape[0]),) + ((0, 0),) * (a.ndim - 1)
    )


def _r8(n: int) -> int:
    return -(-n // 8) * 8


def _forward_cf(xt, vd, Ws, bs, cfg: FlexibleNeRFConfig, wdtype,
                save: bool = False):
    """Shared forward. Ws/bs order: [layer1, layers_xyz_0..t-2, fc_alpha,
    fc_feat, layers_dir_0, fc_rgb]; weight `in` dims arrive 8-row padded
    (see _pad_params). Returns (out4, residuals | None)."""
    t = cfg.trunk_depth
    enc_x = _pad_rows(
        _pe_rows(xt, cfg.num_encoding_fn_xyz, cfg.include_input_xyz,
                 cfg.log_sampling_xyz),
        Ws[0].shape[0],
    )
    res = {"enc_x": enc_x, "pre": []}
    h = enc_x
    for i in range(t):
        z = _dot_in(Ws[i], h, wdtype) + bs[i]
        if save:
            res["pre"].append((h, z))
        h = jnp.maximum(z, 0.0)
    Wa, Wf, Wd, Wr = Ws[t], Ws[t + 1], Ws[t + 2], Ws[t + 3]
    ba, bf, bd, br = bs[t], bs[t + 1], bs[t + 2], bs[t + 3]
    sigma = _dot_in(Wa, h, wdtype) + ba  # (1, B) raw
    zf = _dot_in(Wf, h, wdtype) + bf
    feat = jnp.maximum(zf, 0.0)
    enc_d = _pe_rows(vd, cfg.num_encoding_fn_dir, cfg.include_input_dir,
                     cfg.log_sampling_dir)
    y_in = _pad_rows(jnp.concatenate([feat, enc_d], axis=0),
                     Wd.shape[0])
    zd = _dot_in(Wd, y_in, wdtype) + bd
    y = jnp.maximum(zd, 0.0)
    rgb = _dot_in(Wr, y, wdtype) + br
    out = jnp.concatenate([rgb, sigma], axis=0)
    if save:
        res.update(h=h, zf=zf, feat=feat, enc_d=enc_d, y_in=y_in, zd=zd, y=y)
        return out, res
    return out, None


def _fwd_kernel(xt_ref, vd_ref, *refs, cfg: FlexibleNeRFConfig, nw: int,
                wdtype):
    out_ref = refs[-1]
    Ws = [refs[i] for i in range(nw)]      # refs: bf16 chunking slices them
    bs = [refs[nw + i][:] for i in range(nw)]
    out, _ = _forward_cf(xt_ref[:], vd_ref[:], Ws, bs, cfg, wdtype)
    out_ref[...] = out


def _bwd_kernel(xt_ref, vd_ref, *refs, cfg: FlexibleNeRFConfig, nw: int,
                wdtype):
    Ws = [refs[i] for i in range(nw)]      # refs: bf16 chunking slices them
    bs = [refs[nw + i][:] for i in range(nw)]
    g_ref = refs[2 * nw]
    outs = refs[2 * nw + 1:]
    dWs = outs[:nw]
    dbs = outs[nw:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in outs:
            r[...] = jnp.zeros_like(r)

    _, res = _forward_cf(xt_ref[:], vd_ref[:], Ws, bs, cfg, wdtype,
                         save=True)
    t = cfg.trunk_depth
    g_rgb = g_ref[0:3, :]
    g_sig = g_ref[3:4, :]

    # rgb head
    dWs[t + 3][...] += _dot_acc(res["y"], g_rgb, wdtype)
    dbs[t + 3][...] += jnp.sum(g_rgb, axis=1, keepdims=True)
    gy = _dot_out(Ws[t + 3], g_rgb, wdtype) * (res["zd"] > 0.0)
    # direction branch
    dWs[t + 2][...] += _dot_acc(res["y_in"], gy, wdtype)
    dbs[t + 2][...] += jnp.sum(gy, axis=1, keepdims=True)
    g_cat = _dot_out(Ws[t + 2], gy, wdtype)
    g_feat = g_cat[: res["feat"].shape[0], :] * (res["zf"] > 0.0)
    # feature head
    dWs[t + 1][...] += _dot_acc(res["h"], g_feat, wdtype)
    dbs[t + 1][...] += jnp.sum(g_feat, axis=1, keepdims=True)
    gh = _dot_out(Ws[t + 1], g_feat, wdtype)
    # sigma head
    dWs[t][...] += _dot_acc(res["h"], g_sig, wdtype)
    dbs[t][...] += jnp.sum(g_sig, axis=1, keepdims=True)
    gh = gh + _dot_out(Ws[t], g_sig, wdtype)
    # trunk
    for i in reversed(range(t)):
        inp, z = res["pre"][i]
        gh = gh * (z > 0.0)
        dWs[i][...] += _dot_acc(inp, gh, wdtype)
        dbs[i][...] += jnp.sum(gh, axis=1, keepdims=True)
        if i:
            gh = _dot_out(Ws[i], gh, wdtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def classic_fused_apply_cf(
    params: dict,
    xt: jnp.ndarray,
    vdt: jnp.ndarray,
    cfg: FlexibleNeRFConfig,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
):
    """Fused classic-NeRF point pipeline, channels-first IO.

    ``params``: {"W": [(in,out) × (trunk_depth+4)], "b": [(out,1) × same]}
    in the order layer1, layers_xyz_*, fc_alpha, fc_feat, layers_dir_0,
    fc_rgb. ``xt``/``vdt``: (3, N). Returns (4, N): rgb logits rows 0-2,
    RAW σ row 3.
    """
    return _run_fwd(params, xt, vdt, cfg, block, interpret)


def _pad_params(params):
    """8-row-align every weight's `in` dim (zero rows — exact)."""
    return {
        "W": [_pad_rows(w, _r8(w.shape[0])) for w in params["W"]],
        "b": list(params["b"]),
    }


def _run_fwd(params, xt, vdt, cfg, block, interpret):
    block = _block_for(xt.shape[1], block)
    xt, n, n_blocks = _pad_lanes(xt, block)
    vdt, _, _ = _pad_lanes(vdt, block)
    wdtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
              else jnp.float32)
    params = _pad_params(params)
    flat = list(params["W"]) + list(params["b"])
    nw = len(params["W"])
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg, nw=nw, wdtype=wdtype),
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


def _vjp_fwd(params, xt, vdt, cfg, block, interpret):
    return _run_fwd(params, xt, vdt, cfg, block, interpret), (params, xt, vdt)


def _vjp_bwd(cfg, block, interpret, res, g):
    params, xt, vdt = res
    block = _block_for(xt.shape[1], block)
    xt, n, n_blocks = _pad_lanes(xt, block)
    vdt, _, _ = _pad_lanes(vdt, block)
    gf, _, _ = _pad_lanes(g, block)
    wdtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
              else jnp.float32)
    in_rows = [w.shape[0] for w in params["W"]]
    params = _pad_params(params)
    flat = list(params["W"]) + list(params["b"])
    nw = len(params["W"])
    out_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in flat]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg, nw=nw, wdtype=wdtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((3, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat]
        + [pl.BlockSpec((4, block), lambda i: (0, i),
                        memory_space=pltpu.VMEM)],
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
        "W": [dw[:r] for dw, r in zip(outs[:nw], in_rows)],
        "b": list(outs[nw:]),
    }
    return d_params, jnp.zeros((3, n), xt.dtype), jnp.zeros((3, n), vdt.dtype)


classic_fused_apply_cf.defvjp(_vjp_fwd, _vjp_bwd)
