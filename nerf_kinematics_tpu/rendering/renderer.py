"""Hierarchical coarse→fine volume rendering.

The classic-NeRF render path (reference call stack: SURVEY.md §3.2 —
stratified sample → coarse MLP → raw2outputs → sample_pdf → fine MLP →
raw2outputs), written as pure jittable functions over parameter pytrees.

TPU notes: the whole per-ray pipeline is one jit region — positional encoding
and compositing fuse into the MLP matmuls; the sample axis is static so XLA
tiles the batched MLP onto the MXU. Full-image rendering is chunked with
``jax.lax.map`` over fixed-size ray chunks (bounded memory, single compile).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..ops.sampling import hierarchical_sample, stratified_sample
from ..ops.volume_render import RenderOutputs, raw2outputs, raw2outputs_cf


@dataclass(frozen=True)
class RenderSettings:
    """Per-phase rendering options (reference YAML: nerf.train / nerf.validation)."""

    num_coarse: int = 64
    num_fine: int = 0
    perturb: bool = True
    lindisp: bool = False
    radiance_field_noise_std: float = 0.0
    white_background: bool = False
    chunksize: int = 131072
    # Hierarchical pass: merge fine with coarse samples (classic NeRF union,
    # needs a per-ray sort — reference parity) vs fine-only sorted
    # importance samples (no sort; the fast engines' default — the per-ray
    # sort costs more than the model itself on TPU).
    merge_hierarchical: bool = True
    # Ray-batch source (train phase only).
    #   "random": gather random pixels from the image stack each step
    #     (reference semantics — instant-ngp samples WITH replacement).
    #   "shuffled": slice a precomputed globally-shuffled per-pixel ray
    #     buffer (train/loop.py::build_shuffled_ray_buffer) in random
    #     window order — without-replacement epoch coverage, and it saves
    #     the ~0.2 ms/step the random gather costs at 8k rays.
    #   "shuffled_epoch": same buffer, re-permuted every epoch.
    # Seed-controlled study (5 seeds x {random,shuffled} + 3 x
    # shuffled_epoch on both 10k/24+24 and 30k/48+48 machina regimes —
    # scripts/sampler_study.py, logs/sweeps/sampler_study_r4_summary.txt):
    # shuffled beats random by +1.15 dB val-mean @10k and +1.37 dB @30k
    # (non-overlapping seed distributions at 30k). shuffled_epoch matches
    # shuffled within noise in BOTH regimes, so the mechanism is
    # without-replacement EPOCH COVERAGE, not the fixed permutation's
    # batch-companion structure. (The round-3 "shuffled craters 10k runs"
    # observation does not reproduce across seeds — 10k-regime seed spread
    # is ±1.4 dB and random itself produced the worst outlier, 31.96.)
    # NGP configs ship "shuffled"; "random" remains for reference parity.
    pixel_sampler: str = "random"

    @classmethod
    def from_cfg(cls, d: dict) -> "RenderSettings":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


def _query(apply_fn, params, pts, viewdirs):
    """Query the radiance field at (..., S, 3) points with per-ray viewdirs."""
    if viewdirs is not None:
        vd = jnp.broadcast_to(viewdirs[..., None, :], pts.shape)
    else:
        vd = None
    return apply_fn(params, pts, vd)


def _composite(apply_fn, apply_cf, params, pts, viewdirs, z, rays_d,
               settings: RenderSettings, noise_key):
    """Query + composite one pass. When ``apply_cf`` (the channels-first
    fused-kernel entry, (params, pts, vd) → (4, N)) is available it is used
    with raw2outputs_cf — the hot path that avoids every (N, 3/4)-layout
    elementwise op; otherwise the classic channels-last pair."""
    noise = settings.radiance_field_noise_std
    key = noise_key if noise > 0 else None
    if apply_cf is not None:
        vd = (jnp.broadcast_to(viewdirs[..., None, :], pts.shape)
              if viewdirs is not None else None)
        raw4 = apply_cf(params, pts, vd)
        return raw2outputs_cf(
            raw4, z, rays_d, noise_std=noise,
            white_background=settings.white_background, noise_key=key,
        )
    raw_rgb, raw_sigma = _query(apply_fn, params, pts, viewdirs)
    return raw2outputs(
        raw_rgb, raw_sigma, z, rays_d, noise_std=noise,
        white_background=settings.white_background, noise_key=key,
    )


def render_rays(
    params_coarse: Any,
    apply_coarse: Callable,
    rays_o,
    rays_d,
    near,
    far,
    settings: RenderSettings,
    key: Optional[jax.Array] = None,
    params_fine: Any = None,
    apply_fine: Optional[Callable] = None,
    use_viewdirs: bool = True,
    viewdirs=None,
    proposal_fn=None,
    apply_coarse_cf=None,
    apply_fine_cf=None,
):
    """Render a batch of rays. Returns (coarse: RenderOutputs, fine: RenderOutputs | None).

    ``near``/``far`` may be scalars or (N,) per-ray arrays. ``viewdirs``
    overrides the default normalize(rays_d) — needed for NDC-warped rays,
    whose view direction must come from the pre-warp rays. ``proposal_fn``
    (key, rays_o, rays_d) → (N, num_coarse) depths replaces the stratified
    coarse sampler (occupancy-guided sample placement).
    ``apply_coarse_cf``/``apply_fine_cf``: optional channels-first fused
    entries ((params, pts, vd) → (4, N)); when given they supersede the
    channels-last apply fns on the query+composite hot path.
    """
    n_rays = rays_o.shape[0]
    deterministic = not settings.perturb
    if key is None:
        key = jax.random.PRNGKey(0)
    k_strat, k_noise_c, k_pdf, k_noise_f = jax.random.split(key, 4)

    if use_viewdirs and viewdirs is None:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    elif not use_viewdirs:
        viewdirs = None

    if proposal_fn is not None:
        z_coarse = proposal_fn(k_strat, rays_o, rays_d)
    else:
        z_coarse = stratified_sample(
            k_strat,
            n_rays,
            settings.num_coarse,
            near,
            far,
            perturb=settings.perturb,
            lindisp=settings.lindisp,
        )
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_coarse[..., :, None]
    coarse = _composite(apply_coarse, apply_coarse_cf, params_coarse, pts,
                        viewdirs, z_coarse, rays_d, settings, k_noise_c)

    fine = None
    if settings.num_fine > 0:
        pf = params_fine if params_fine is not None else params_coarse
        af = apply_fine if apply_fine is not None else apply_coarse
        af_cf = apply_fine_cf if apply_fine_cf is not None else apply_coarse_cf
        z_all = hierarchical_sample(
            k_pdf,
            z_coarse,
            jax.lax.stop_gradient(coarse.weights),
            settings.num_fine,
            deterministic=deterministic,
            merge=settings.merge_hierarchical,
        )
        pts_f = rays_o[..., None, :] + rays_d[..., None, :] * z_all[..., :, None]
        fine = _composite(af, af_cf, pf, pts_f, viewdirs, z_all, rays_d,
                          settings, k_noise_f)

    return coarse, fine


def render_image(
    params_coarse,
    apply_coarse,
    rays_o,
    rays_d,
    near,
    far,
    settings: RenderSettings,
    params_fine=None,
    apply_fine=None,
    use_viewdirs: bool = True,
    chunk_rays: Optional[int] = None,
    viewdirs=None,
    proposal_fn=None,
    apply_coarse_cf=None,
    apply_fine_cf=None,
):
    """Render an (H, W) image by mapping ``render_rays`` over fixed-size ray
    chunks (lax.map ⇒ one compiled program, serial chunks, bounded memory).

    The pixel count is padded up to a whole number of chunks; padding rays are
    rendered and discarded (static shapes beat a ragged tail on TPU).
    Returns an (H, W, 3) rgb image plus (H, W) disp/acc/depth maps from the
    finest available model.
    """
    H, W = rays_o.shape[:2]
    n = H * W
    chunk = chunk_rays or max(settings.chunksize // max(settings.num_coarse + settings.num_fine, 1), 1)
    chunk = min(chunk, n)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n

    def _chunked(x):
        flat = jnp.concatenate([x.reshape(-1, 3), jnp.ones((pad, 3), x.dtype)])
        return flat.reshape(n_chunks, chunk, 3)

    chunks_o, chunks_d = _chunked(rays_o), _chunked(rays_d)
    chunks_vd = _chunked(viewdirs) if viewdirs is not None else None

    eval_settings = settings if not settings.perturb else RenderSettings(
        **{**settings.__dict__, "perturb": False, "radiance_field_noise_std": 0.0}
    )

    def _one(chunk_args):
        if chunks_vd is not None:
            o, d, vd = chunk_args
        else:
            (o, d), vd = chunk_args, None
        coarse, fine = render_rays(
            params_coarse,
            apply_coarse,
            o,
            d,
            near,
            far,
            eval_settings,
            key=None,
            params_fine=params_fine,
            apply_fine=apply_fine,
            use_viewdirs=use_viewdirs,
            viewdirs=vd,
            proposal_fn=proposal_fn,
            apply_coarse_cf=apply_coarse_cf,
            apply_fine_cf=apply_fine_cf,
        )
        out = fine if fine is not None else coarse
        return out.rgb, out.disp, out.acc, out.depth

    mapped = (chunks_o, chunks_d) if chunks_vd is None else (chunks_o, chunks_d, chunks_vd)
    rgb, disp, acc, depth = jax.lax.map(_one, mapped)
    unpad = lambda x, ch: x.reshape(-1, *ch)[:n].reshape(H, W, *ch)
    return {
        "rgb": unpad(rgb, (3,)),
        "disp": unpad(disp, ()),
        "acc": unpad(acc, ()),
        "depth": unpad(depth, ()),
    }
