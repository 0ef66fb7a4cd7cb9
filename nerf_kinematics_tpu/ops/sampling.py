"""Depth samplers: stratified (coarse) and inverse-CDF importance (fine).

Reference semantics: classic-NeRF stratified sampling with ``perturb`` jitter
and ``lindisp`` (config surface: nerf.train.{num_coarse,perturb,lindisp} in
trained_models/nerf-pytorch/*/config.yml) and hierarchical ``sample_pdf``
inverse-transform sampling of the coarse weight PDF (num_fine).

Everything is statically shaped and batched over rays; randomness comes from
explicit jax PRNG keys (functional, reproducible, shardable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_sample(
    key,
    n_rays: int,
    num_samples: int,
    near,
    far,
    perturb: bool = True,
    lindisp: bool = False,
    dtype=jnp.float32,
):
    """(n_rays, num_samples) depth values t in [near, far].

    Bin midpoints are evenly spaced in depth (or in disparity when
    ``lindisp``); with ``perturb``, one uniform jitter per bin per ray.
    """
    t = jnp.linspace(0.0, 1.0, num_samples, dtype=dtype)
    near = jnp.asarray(near, dtype)
    far = jnp.asarray(far, dtype)
    if near.ndim > 0:  # per-ray bounds: (n_rays,) → broadcast over samples
        near = near[..., None]
    if far.ndim > 0:
        far = far[..., None]
    if lindisp:
        z = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    else:
        z = near * (1.0 - t) + far * t
    z = jnp.broadcast_to(z, (n_rays, num_samples))
    if perturb:
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = jnp.concatenate([mids, z[..., -1:]], axis=-1)
        lower = jnp.concatenate([z[..., :1], mids], axis=-1)
        u = jax.random.uniform(key, z.shape, dtype=dtype)
        z = lower + (upper - lower) * u
    return z


def sample_pdf(key, bins, weights, num_samples: int, deterministic: bool = False):
    """Inverse-transform sampling from a piecewise-constant PDF over ``bins``.

    Args:
      key: PRNG key (ignored when deterministic).
      bins: (..., M+1) bin edges (typically midpoints of coarse samples).
      weights: (..., M) unnormalized bin weights.
      num_samples: number of fine samples to draw.
      deterministic: evenly spaced u instead of random (validation mode,
        matching the reference's ``perturb: false`` validation config).

    Returns: (..., num_samples) sample positions. Implemented with
    ``searchsorted`` + gathers — static shapes, fully vmappable.
    """
    dtype = weights.dtype
    weights = weights + 1e-5  # avoid NaN for empty rays
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (..., M+1)

    if deterministic:
        u = jnp.linspace(0.0, 1.0, num_samples, dtype=dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], num_samples))
    else:
        u = jax.random.uniform(key, (*cdf.shape[:-1], num_samples), dtype=dtype)

    # For each u find its CDF bin: inds in [1, M+1); vmapped searchsorted.
    def _ss(c, uu):
        return jnp.searchsorted(c, uu, side="right")

    flat_cdf = cdf.reshape(-1, cdf.shape[-1])
    flat_u = u.reshape(-1, num_samples)
    inds = jax.vmap(_ss)(flat_cdf, flat_u).reshape(u.shape)

    below = jnp.clip(inds - 1, 0, cdf.shape[-1] - 1)
    above = jnp.clip(inds, 0, cdf.shape[-1] - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, jnp.clip(below, 0, bins.shape[-1] - 1), axis=-1)
    bins_above = jnp.take_along_axis(bins, jnp.clip(above, 0, bins.shape[-1] - 1), axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    frac = (u - cdf_below) / denom
    return bins_below + frac * (bins_above - bins_below)


def hierarchical_sample(key, z_coarse, weights, num_fine: int, deterministic: bool = False):
    """Fine-sample depths from coarse weights and merge (sorted union) with the
    coarse depths — the classic hierarchical scheme. Interior weights only
    (first/last dropped), bins at coarse midpoints.

    Returns (..., num_coarse + num_fine) sorted depths.
    """
    mids = 0.5 * (z_coarse[..., 1:] + z_coarse[..., :-1])
    z_fine = sample_pdf(
        key, mids, weights[..., 1:-1], num_fine, deterministic=deterministic
    )
    z_fine = jax.lax.stop_gradient(z_fine)
    return jnp.sort(jnp.concatenate([z_coarse, z_fine], axis=-1), axis=-1)
