"""Instant-NGP-class model: hash-grid encoder + tiny fused-width MLPs.

Architecture pinned to the reference's logged network summary
(instant_ngp_collab_cloud.ipynb cell 23):

    Density model: 3 --[HashGrid L=8 T=2^19 F=4 Nmin=16]--> 32 --[MLP 64x3]--> 16
    Color model:   3 --[SH deg 4]--> 16, concat 16 density feats --> 32
                     --[MLP 64x4]--> 3
    total encoding params ≈ 12.7M; network params 10,240.

Density σ = exp(clamped first channel) (NGP's log-space density); RGB =
sigmoid. MLP widths of 64 are zero-padded to the 128-lane TPU tile by XLA;
the whole point→radiance path is one fusable jit region.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.cp_grid import CPGridConfig, cp_encode, init_cp_lines
from ..ops.hashgrid import HashGridConfig, hash_encode, init_table
from ..ops.sh import sh_encode


@dataclass(frozen=True)
class NGPConfig:
    # Positional encoder:
    #   "auto"      — cp_pallas on TPU, cp elsewhere (the analog of the
    #                 reference picking FullyFusedMLP vs CutlassMLP by
    #                 compute capability, notebook cell 15).
    #   "cp"        — CP-factorized folded multires grid via XLA matmuls
    #                 (runs everywhere; TPU-native design).
    #   "cp_pallas" — same math as one fused Pallas TPU kernel (fastest;
    #                 interpret-mode on CPU for tests).
    #   "hash"      — reference-parity Instant-NGP hash grid (gather-bound
    #                 on TPU; kept for parity/validation — see
    #                 ops/cp_grid.py docstring for the rationale).
    encoder: str = "cp"
    grid: HashGridConfig = field(default_factory=HashGridConfig)
    cp: CPGridConfig = field(default_factory=CPGridConfig)
    density_width: int = 64
    density_layers: int = 3  # hidden layers ("MLP(neurons=64, layers=3)")
    density_out: int = 16
    color_width: int = 64
    color_layers: int = 4
    sh_degree: int = 4
    # Occupancy acceleration (instant-ngp's occupancy-bitfield ray marching,
    # recast as importance weighting — ops/occupancy.py).
    use_occupancy: bool = False
    occ_resolution: int = 96
    occ_update_every: int = 256
    # Proposal lookup: "grid" = exact per-bin 3D nearest-cell gather
    # (measured 3.7 ms/step at 8192x64 on v5e — XLA TPU gathers run
    # ~140M elem/s); "hull" = visual-hull proxy from the three 2D
    # pair-projections via one-hot matmuls, gather-free and near-exact
    # (machina A/B: grid 29.1 dB / hull ≈ grid / 1D-projected 27.6 dB);
    # "projected" = 1D axis-projection proxy (cheapest, loosest).
    occ_proposal: str = "hull"
    # Proposal quadrature: number of uniform depth bins the occupancy PDF is
    # evaluated on (per ray), and the uniform exploration floor added to the
    # normalized occupancy weights (fraction of the max-bin weight).
    occ_bins: int = 64
    occ_floor: float = 1e-2
    # Incremental maintenance between full sweeps (NGP's steady-state decay
    # + random-subset requery); full sweep every ``occ_full_every`` steps.
    occ_incremental_cells: int = 65536
    occ_full_every: int = 2048
    # Scene contraction for aabb_scale > 2 (ops/contraction.py — the TPU
    # equivalent of instant-ngp's occupancy cascades): "auto" enables it
    # when the scene bound exceeds 2; "on"/"off" force it. ``contract_inner``
    # is the half-width (world units) of the central linear region; 0 (the
    # default) resolves to max(1, bound/4) — big enough that mid-field
    # content keeps usable grid resolution, small enough that the subject
    # gets the lion's share (the finest-cascade role in NGP's scheme).
    contraction: str = "auto"
    contract_inner: float = 0.0
    # MXU compute dtype for the MLPs ("float32" | "bfloat16"); params f32.
    compute_dtype: str = "float32"
    # Fully-fused point pipeline (ops/ngp_fused_pallas.py): run
    # encode→density-MLP→color-MLP as ONE Pallas kernel (fwd + bwd), the
    # tiny-cuda-nn fully_fused_mlp equivalent. "auto" = on whenever the
    # cp_pallas encoder is active; "on"/"off" force it. Training-path only
    # (density sweeps and mesh export use the unfused module).
    fused: str = "auto"
    # Point-block width of the fused kernel (0 = ops/ngp_fused_pallas
    # DEFAULT_BLOCK). Bigger blocks amortize per-block weight loads but
    # grow the backward kernel's VMEM residency with the table size.
    fused_block: int = 0
    # One-invocation train objective (ops/ngp_fused_pallas
    # ngp_fused_train_cf): fine forward + per-ray compositing + MSE + full
    # backward in a single Pallas kernel — removes the separate fine
    # forward kernel, its duplicate tent/encoder work in the backward's
    # recompute, and the XLA compositing glue (round-5 trace: −1.2 ms on
    # the flagship step). "auto" = on whenever the step shape is eligible
    # (fused encoder, coarse_loss_weight 0, num_fine > 0, viewdirs, no
    # density noise, rays % 128 == 0); "on" = require (raise if not
    # eligible); "off" = always use the autodiff path; "full" = the
    # whole-step kernel (hull proposal + inverse-CDF sampling + σ-coarse
    # in-kernel too) — measured SLOWER than the two-kernel default on v5e
    # (4.55 vs 4.11 ms/step: the monolith's serialized stages pipeline
    # worse than separate invocations), kept as the measured record.
    fused_train: str = "auto"

    @classmethod
    def from_cfg(cls, d: dict) -> "NGPConfig":
        d = dict(d)
        grid_keys = set(HashGridConfig.__dataclass_fields__)
        grid = HashGridConfig(**{k: v for k, v in d.items() if k in grid_keys})
        cp_keys = set(CPGridConfig.__dataclass_fields__) - grid_keys
        cp_kwargs = {k: v for k, v in d.items() if k in cp_keys}
        # Shared names (n_levels, base_resolution, max_resolution) configure
        # BOTH encoders unconditionally — the encoder selection (including
        # "auto"/"cp_pallas") decides which is used at runtime, so gating on
        # the name here would silently drop YAML values for cp variants.
        shared = set(CPGridConfig.__dataclass_fields__) & grid_keys
        cp_kwargs.update({k: v for k, v in d.items() if k in shared})
        cp = CPGridConfig(**cp_kwargs)
        # Optional nested ``grid:`` / ``cp:`` sections override per-encoder
        # (shared flat names like n_levels hit both; nesting lets e.g.
        # fox_ngp shape the CP encoder while keeping the reference-exact
        # hash-grid dims pinned for ``encoder: hash``).
        import dataclasses as _dc

        if isinstance(d.get("grid"), dict):
            grid = _dc.replace(
                grid, **{k: v for k, v in d["grid"].items() if k in grid_keys}
            )
        if isinstance(d.get("cp"), dict):
            all_cp = set(CPGridConfig.__dataclass_fields__)
            cp = _dc.replace(
                cp, **{k: v for k, v in d["cp"].items() if k in all_cp}
            )
        own = set(cls.__dataclass_fields__) - {"grid", "cp"}
        return cls(grid=grid, cp=cp, **{k: v for k, v in d.items() if k in own})

    def resolved_encoder(self) -> str:
        if self.encoder != "auto":
            return self.encoder
        return "cp_pallas" if jax.default_backend() == "tpu" else "cp"

    @property
    def encoding_dim(self) -> int:
        if self.resolved_encoder() == "hash":
            return self.grid.out_dim
        return self.cp.out_dim


class NGPModel(nn.Module):
    """(xyz in [0,1]^3, viewdir) → (rgb logits, σ). σ uses exp activation on a
    clamped logit, applied here (raw2outputs then receives identity-activated
    density via its relu — already positive)."""

    config: NGPConfig = NGPConfig()

    def setup(self):
        cfg = self.config
        enc = cfg.resolved_encoder()
        if enc == "hash":
            self.table = self.param(
                "hash_table", lambda key: init_table(key, cfg.grid)
            )
        elif enc == "cp":
            shape = (3, cfg.cp.table_size, cfg.cp.n_components)
            self.cp_lines = [
                self.param(
                    f"cp_lines_{l}",
                    (lambda s: lambda key: 0.5 + 0.1 * jax.random.normal(key, s))(shape),
                )
                for l in range(cfg.cp.n_levels)
            ]
        elif enc == "cp_pallas":
            from ..ops.cp_grid_pallas import init_stacked_lines

            self.cp_stacked = self.param(
                "cp_lines", lambda key: init_stacked_lines(key, cfg.cp)
            )
        else:
            raise ValueError(f"unknown encoder {enc!r}")
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.density_mlp = [
            nn.Dense(cfg.density_width, name=f"density_{i}", dtype=dtype)
            for i in range(cfg.density_layers - 1)
        ] + [nn.Dense(cfg.density_out, name="density_out", dtype=dtype)]
        self.color_mlp = [
            nn.Dense(cfg.color_width, name=f"color_{i}", dtype=dtype)
            for i in range(cfg.color_layers - 1)
        ] + [nn.Dense(3, name="color_out", dtype=dtype)]

    def encode(self, xyz):
        cfg = self.config
        enc = cfg.resolved_encoder()
        if enc == "hash":
            return hash_encode(self.table, xyz, cfg.grid)
        if enc == "cp_pallas":
            from ..ops.cp_grid_pallas import cp_encode_pallas

            interpret = jax.default_backend() != "tpu"
            return cp_encode_pallas(self.cp_stacked, xyz, cfg.cp, 512, interpret)
        return cp_encode(list(self.cp_lines), xyz, cfg.cp)

    def density(self, xyz):
        """σ and the 16-dim geometry feature vector at unit-cube points."""
        cfg = self.config
        h = self.encode(xyz)
        for layer in self.density_mlp[:-1]:
            h = nn.relu(layer(h))
        h = self.density_mlp[-1](h)
        # Log-space density, clamped for numerical safety (exp(15) ≈ 3.3e6);
        # computed in f32 regardless of MLP compute dtype.
        sigma = jnp.exp(jnp.clip(h[..., 0].astype(jnp.float32), -15.0, 15.0))
        return sigma, h

    def __call__(self, xyz, viewdirs=None):
        cfg = self.config
        sigma, feat = self.density(xyz)
        if viewdirs is None:
            viewdirs = jnp.zeros_like(xyz).at[..., 2].set(1.0)
        sh = sh_encode(viewdirs, cfg.sh_degree)
        h = jnp.concatenate([feat, sh], axis=-1)
        for layer in self.color_mlp[:-1]:
            h = nn.relu(layer(h))
        rgb = self.color_mlp[-1](h).astype(jnp.float32)  # pre-sigmoid logits
        return rgb, sigma
