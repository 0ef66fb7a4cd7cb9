"""Real spherical-harmonics direction encoding (degree ≤ 4 → 16 features).

The fast-NeRF reference encodes view directions with SH degree 4 (16
coefficients — the "Composite 16+16" color-model input logged in
instant_ngp_collab_cloud.ipynb cell 23). Closed-form real SH basis evaluated
componentwise — pure VPU math, fuses into the color MLP's first matmul.
"""

from __future__ import annotations

import jax.numpy as jnp


def sh_encode(dirs: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Evaluate the real SH basis at unit directions.

    dirs: (..., 3), assumed normalized. Returns (..., degree^2).
    Coefficients are the standard hard-coded real SH constants.
    """
    if degree < 1 or degree > 4:
        raise ValueError("sh_encode supports degree 1..4")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full_like(x, 0.28209479177387814)]  # l=0
    if degree > 1:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * zz - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (xx - yy),
        ]
    if degree > 3:
        out += [
            0.59004358992664352 * y * (-3.0 * xx + yy),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * zz),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * zz),
            1.4453057213202769 * z * (xx - yy),
            0.59004358992664352 * x * (-xx + 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)
