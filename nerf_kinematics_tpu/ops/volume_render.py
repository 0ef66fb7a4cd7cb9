"""Volume-rendering compositing (the classic ``raw2outputs``).

Reference semantics: α = 1 - exp(-softplus-free ReLU(σ + noise)·δ),
transmittance as an exclusive cumulative product, RGB/depth/disparity/acc
maps, training-time density noise regularizer, optional white background
(config surface: radiance_field_noise_std, white_background in
trained_models/nerf-pytorch/*/config.yml:53-54).

The cumprod is expressed with ``jnp.cumprod`` on a statically-shaped sample
axis — XLA lowers it to an associative scan that stays fused with the
surrounding elementwise math on TPU.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RenderOutputs(NamedTuple):
    rgb: jnp.ndarray  # (..., 3)
    disp: jnp.ndarray  # (...,)
    acc: jnp.ndarray  # (...,)
    weights: jnp.ndarray  # (..., S)
    depth: jnp.ndarray  # (...,)


def raw2outputs(
    raw_rgb,
    raw_sigma,
    z_vals,
    rays_d,
    noise_std: float = 0.0,
    white_background: bool = False,
    noise_key: Optional[jax.Array] = None,
) -> RenderOutputs:
    """Composite per-sample radiance/density into per-ray maps.

    Args:
      raw_rgb: (..., S, 3) pre-sigmoid color logits.
      raw_sigma: (..., S) pre-activation density.
      z_vals: (..., S) sample depths along each ray.
      rays_d: (..., 3) (unnormalized) ray directions — δ intervals are scaled
        by ||d|| so density is in world units.
      noise_std: stddev of Gaussian noise added to σ before ReLU (training
        regularizer; 0 disables).
      white_background: composite onto white.
      noise_key: PRNG key, required when noise_std > 0.
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    # Last interval is unbounded (classic 1e10 sentinel).
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    sigma = raw_sigma
    if noise_std > 0.0:
        if noise_key is None:
            raise ValueError("noise_std > 0 requires noise_key")
        sigma = sigma + noise_std * jax.random.normal(
            noise_key, sigma.shape, dtype=sigma.dtype
        )
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)

    # Exclusive cumprod of (1 - α): transmittance before each sample.
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    weights = alpha * trans

    rgb = jax.nn.sigmoid(raw_rgb)
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(
        1e-10, depth_map / jnp.maximum(acc_map, 1e-10)
    )
    if white_background:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return RenderOutputs(rgb_map, disp_map, acc_map, weights, depth_map)


def raw2outputs_cf(
    raw4,
    z_vals,
    rays_d,
    noise_std: float = 0.0,
    white_background: bool = False,
    noise_key: Optional[jax.Array] = None,
) -> RenderOutputs:
    """Channels-first :func:`raw2outputs` for the fused-kernel path.

    ``raw4``: (4, R*S) — rgb logit rows 0-2, row 3 is σ **already
    exp-activated** by the fused kernel (ops/ngp_fused_pallas._sigma_row),
    points flattened ray-major (the output contract of
    ops/ngp_fused_pallas.ngp_fused_apply_cf). Because σ arrives activated,
    the relu below is a no-op and ``noise_std`` noise is added
    *post-activation* — a deliberate semantic difference from the classic
    :func:`raw2outputs`, which perturbs the raw pre-activation density. The
    fused NGP path trains with noise_std=0, so the difference is inert
    there; enable noise on the classic path if pre-activation semantics
    matter. Same math as raw2outputs otherwise, but
    every elementwise op runs on (R, S)- or (3, R, S)-shaped arrays — full
    128-lane tiles — instead of (N, 3)/(N, 4) arrays that use 3-4 lanes
    (measured ~5 ms/step of such ops in the round-2 train-step profile).
    """
    R, S = z_vals.shape[-2], z_vals.shape[-1]
    sigma = raw4[3, :].reshape(R, S)
    rgb_l = raw4[0:3, :].reshape(3, R, S)

    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    if noise_std > 0.0:
        if noise_key is None:
            raise ValueError("noise_std > 0 requires noise_key")
        sigma = sigma + noise_std * jax.random.normal(
            noise_key, sigma.shape, dtype=sigma.dtype
        )
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)

    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1
    )
    weights = alpha * trans  # (R, S)

    rgb = jax.nn.sigmoid(rgb_l)  # (3, R, S)
    rgb_map = jnp.einsum("rs,crs->rc", weights, rgb)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(
        1e-10, depth_map / jnp.maximum(acc_map, 1e-10)
    )
    if white_background:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return RenderOutputs(rgb_map, disp_map, acc_map, weights, depth_map)
