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


def sample_pdf(
    key,
    bins,
    weights,
    num_samples: int,
    deterministic: bool = False,
    stratified_u: bool = False,
):
    """Inverse-transform sampling from a piecewise-constant PDF over ``bins``.

    Args:
      key: PRNG key (ignored when deterministic).
      bins: (..., M+1) bin edges (typically midpoints of coarse samples).
      weights: (..., M) unnormalized bin weights.
      num_samples: number of fine samples to draw.
      deterministic: evenly spaced u instead of random (validation mode,
        matching the reference's ``perturb: false`` validation config).
      stratified_u: jittered-linspace u instead of iid uniforms — u (and
        therefore the returned samples) come out SORTED, which lets callers
        skip the per-ray sort entirely.

    Returns: (..., num_samples) sample positions.

    TPU note: bin location uses a broadcasted comparison-count
    (sum(cdf <= u) over the static M+1 axis) instead of a vmapped
    ``searchsorted`` — the comparison tensor is pure VPU work and benches
    ~40x faster on TPU than the scalarized binary search.
    """
    dtype = weights.dtype
    weights = weights + 1e-5  # avoid NaN for empty rays
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (..., M+1)

    if deterministic:
        u = jnp.linspace(0.0, 1.0, num_samples, dtype=dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], num_samples))
    elif stratified_u:
        base = jnp.arange(num_samples, dtype=dtype) / num_samples
        jitter = jax.random.uniform(
            key, (*cdf.shape[:-1], num_samples), dtype=dtype
        ) / num_samples
        u = base + jitter  # sorted per ray by construction
    else:
        u = jax.random.uniform(key, (*cdf.shape[:-1], num_samples), dtype=dtype)

    # Count cdf entries <= u: inds in [1, M+1) (u >= cdf[0] = 0 always).
    # (..., S, M+1) comparison, summed over the bin axis. The subsequent
    # per-sample bin values are selected with one-hot reductions over the
    # SAME static axis instead of take_along_axis — zero gathers end to end
    # (XLA gathers are the slowest primitive on TPU; this whole function is
    # pure VPU work).
    M1 = cdf.shape[-1]
    cmp = (cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32)  # (...,S,M+1)
    inds = jnp.clip(jnp.sum(cmp, axis=-1), 1, M1 - 1)

    iota = jnp.arange(M1, dtype=jnp.int32)
    onehot_b = ((inds - 1)[..., None] == iota).astype(cdf.dtype)  # (...,S,M+1)
    onehot_a = (inds[..., None] == iota).astype(cdf.dtype)

    def select(vals, onehot):
        return jnp.sum(vals[..., None, :] * onehot, axis=-1)

    cdf_below = select(cdf, onehot_b)
    cdf_above = select(cdf, onehot_a)
    bins_below = select(bins, onehot_b)
    bins_above = select(bins, onehot_a)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    frac = (u - cdf_below) / denom
    return bins_below + frac * (bins_above - bins_below)


def hierarchical_sample(
    key,
    z_coarse,
    weights,
    num_fine: int,
    deterministic: bool = False,
    merge: bool = True,
):
    """Fine-sample depths from coarse weights. Interior weights only
    (first/last dropped), bins at coarse midpoints.

    merge=True (classic scheme): sorted union with the coarse depths —
    (..., num_coarse + num_fine). Required for parity with the reference's
    coarse∪fine evaluation, but the per-ray sort is expensive on TPU.

    merge=False (fast engines): return only the importance samples, drawn
    with stratified (jittered-linspace) u so they are already sorted —
    (..., num_fine), no sort anywhere.
    """
    mids = 0.5 * (z_coarse[..., 1:] + z_coarse[..., :-1])
    z_fine = sample_pdf(
        key,
        mids,
        weights[..., 1:-1],
        num_fine,
        deterministic=deterministic,
        stratified_u=not merge,
    )
    z_fine = jax.lax.stop_gradient(z_fine)
    if not merge:
        return z_fine
    return jnp.sort(jnp.concatenate([z_coarse, z_fine], axis=-1), axis=-1)
