"""Classic-NeRF view-dependent MLP ("FlexibleNeRF").

Architecture is pinned to the *reference checkpoint structure* (the ground
truth per SURVEY.md §2.2): for ``num_layers: 8, hidden_size: 128,
skip_connect_every: 3, L_xyz=10, L_dir=4`` the saved state dict contains

    layer1.weight        (128, 63)
    layers_xyz.{0,1,2}   (128, 128)
    fc_feat              (128, 128)
    layers_dir.0         (64, 155)      # 155 = 128 feat + 27 dir
    fc_alpha             (1, 128)
    fc_rgb               (3, 64)

i.e. the xyz trunk has ``num_layers // 2`` linear layers (NOT num_layers — the
reference fork's constructor halves the depth; checkpoints are authoritative,
see trained_models/nerf-pytorch/*/checkpoint110000.ckpt), a σ head off the
trunk output, and a half-width single-layer direction branch. Skip
connections concatenate γ(xyz) at trunk layer i when ``i % skip_connect_every
== 0 and i > 0`` — which never fires at this depth, matching the checkpoint's
all-(128,128) trunk.

Parameters are named to make torch-checkpoint import a pure rename
(io/torch_compat.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from ..ops.positional_encoding import encoding_dim, positional_encoding


@dataclass(frozen=True)
class FlexibleNeRFConfig:
    num_layers: int = 8
    hidden_size: int = 128
    skip_connect_every: int = 3
    num_encoding_fn_xyz: int = 10
    num_encoding_fn_dir: int = 4
    include_input_xyz: bool = True
    include_input_dir: bool = True
    log_sampling_xyz: bool = True
    log_sampling_dir: bool = True
    use_viewdirs: bool = True
    # MXU compute dtype ("float32" | "bfloat16"); parameters stay float32.
    # bf16 roughly quadruples TPU matmul throughput; outputs are cast back
    # to f32 before compositing (raw2outputs stays full precision).
    compute_dtype: str = "float32"
    # Fused Pallas point pipeline (ops/classic_fused_pallas.py):
    # "auto" = use it on TPU when the config is supported (use_viewdirs,
    # no skip concat); "on" forces it (interpret mode off-TPU — tests);
    # "off" keeps the flax module everywhere.
    fused: str = "auto"

    @property
    def dim_xyz(self) -> int:
        return encoding_dim(3, self.num_encoding_fn_xyz, self.include_input_xyz)

    @property
    def dim_dir(self) -> int:
        return encoding_dim(3, self.num_encoding_fn_dir, self.include_input_dir)

    @property
    def trunk_depth(self) -> int:
        return max(self.num_layers // 2, 1)

    @classmethod
    def from_model_cfg(cls, d: dict) -> "FlexibleNeRFConfig":
        """Build from a reference YAML ``models.coarse``/``models.fine`` dict."""
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


class FlexibleNeRF(nn.Module):
    """Maps (xyz, viewdir) → (rgb logits (3,), σ (1,)) for a batch of points.

    Inputs are raw 3-vectors; positional encoding happens inside the module so
    the whole point→radiance computation is one fusable jit region.
    """

    config: FlexibleNeRFConfig = FlexibleNeRFConfig()

    @nn.compact
    def __call__(self, xyz, viewdirs=None):
        cfg = self.config
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        dense = lambda n, name: nn.Dense(n, name=name, dtype=dtype)
        enc_xyz = positional_encoding(
            xyz, cfg.num_encoding_fn_xyz, cfg.include_input_xyz, cfg.log_sampling_xyz
        ).astype(dtype)
        x = nn.relu(dense(cfg.hidden_size, "layer1")(enc_xyz))
        for i in range(cfg.trunk_depth - 1):
            if i % cfg.skip_connect_every == 0 and i > 0:
                x = jnp.concatenate([x, enc_xyz], axis=-1)
            x = nn.relu(dense(cfg.hidden_size, f"layers_xyz_{i}")(x))

        if cfg.use_viewdirs:
            if viewdirs is None:
                raise ValueError("use_viewdirs=True requires viewdirs input")
            enc_dir = positional_encoding(
                viewdirs,
                cfg.num_encoding_fn_dir,
                cfg.include_input_dir,
                cfg.log_sampling_dir,
            ).astype(dtype)
            sigma = dense(1, "fc_alpha")(x)
            feat = nn.relu(dense(cfg.hidden_size, "fc_feat")(x))
            y = jnp.concatenate([feat, enc_dir], axis=-1)
            y = nn.relu(dense(cfg.hidden_size // 2, "layers_dir_0")(y))
            rgb = dense(3, "fc_rgb")(y)
        else:
            out = dense(4, "fc_out")(x)
            rgb, sigma = out[..., :3], out[..., 3:]

        return rgb.astype(jnp.float32), sigma[..., 0].astype(jnp.float32)
