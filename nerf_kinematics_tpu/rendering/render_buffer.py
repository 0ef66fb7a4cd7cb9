"""Accumulating render buffer: multi-sample accumulation + tonemapping.

Render-target abstraction mirroring the reference's ``src/render_buffer.cu``
(spp accumulation, tonemap before display/save). Functional: the buffer is a
small pytree; ``accumulate`` averages successive stochastic renders (e.g.
different PRNG sample jitters) and ``tonemap`` maps linear radiance to
display sRGB.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RenderBuffer(NamedTuple):
    accum: jnp.ndarray  # (H, W, 3) running sum of linear radiance
    spp: jnp.ndarray  # scalar int32 samples accumulated

    @property
    def resolved(self) -> jnp.ndarray:
        return self.accum / jnp.maximum(self.spp, 1)


def new_buffer(h: int, w: int) -> RenderBuffer:
    return RenderBuffer(jnp.zeros((h, w, 3), jnp.float32), jnp.int32(0))


def accumulate(buf: RenderBuffer, frame: jnp.ndarray) -> RenderBuffer:
    return RenderBuffer(buf.accum + frame, buf.spp + 1)


def tonemap(linear: jnp.ndarray, exposure: float = 0.0, srgb: bool = True) -> jnp.ndarray:
    """Exposure + sRGB transfer; clamps to [0, 1]."""
    x = linear * (2.0**exposure)
    if srgb:
        x = jnp.where(
            x <= 0.0031308, 12.92 * x, 1.055 * jnp.power(jnp.maximum(x, 1e-8), 1 / 2.4) - 0.055
        )
    return jnp.clip(x, 0.0, 1.0)
