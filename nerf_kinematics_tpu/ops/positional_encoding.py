"""Sinusoidal positional encoding γ(p).

Reference semantics: the classic-NeRF fork's ``positional_encoding``
(config surface: num_encoding_fn_xyz/dir, include_input_*, log_sampling_* in
trained_models/nerf-pytorch/*/config.yml:21-26). For L=10 with include_input
the xyz encoding is 3 + 3*2*10 = 63-dim (matches the reference checkpoint's
``layer1.weight (128, 63)``); dirs at L=4 give 27-dim.

One broadcasted expression — XLA fuses it into the consuming matmul, so it
costs ~zero HBM traffic on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def encoding_dim(in_dim: int, num_freqs: int, include_input: bool = True) -> int:
    return in_dim * (2 * num_freqs + (1 if include_input else 0))


def positional_encoding(
    x,
    num_freqs: int,
    include_input: bool = True,
    log_sampling: bool = True,
):
    """γ(x): concat [x?, sin(f_k x), cos(f_k x)] over frequency bands f_k.

    Args:
      x: (..., D) input.
      num_freqs: number of frequency bands L.
      include_input: prepend the raw input.
      log_sampling: frequencies 2^0 .. 2^(L-1) (log-spaced); otherwise linear
        in [2^0, 2^(L-1)].

    Returns (..., encoding_dim(D, L, include_input)).
    """
    if num_freqs == 0:
        return x if include_input else x[..., :0]
    if log_sampling:
        freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    else:
        freqs = jnp.linspace(2.0**0, 2.0 ** (num_freqs - 1), num_freqs, dtype=x.dtype)
    xb = x[..., None, :] * freqs[:, None]  # (..., L, D)
    # Interleave per-frequency [sin, cos] pairs: layout (..., L, 2, D) → flat.
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)
    enc = enc.reshape(*x.shape[:-1], -1)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
