"""Analytic FLOPs accounting for the training step (bench MFU reporting).

XLA's compiled-executable ``cost_analysis()`` undercounts here: ``lax.scan``
bodies are counted once regardless of trip count, and Pallas kernels are
opaque custom calls (0 flops). These formulas count the real work per sample
point from the model configuration; backward = 2x forward for the
matmul-dominated paths (dW and dx each cost one forward-shaped matmul).

Convention: one fused multiply-add = 2 FLOPs (matmul m·k·n → 2mkn).
"""

from __future__ import annotations


def _mlp_fwd(dims) -> int:
    """FLOPs/point for a dense chain with layer widths ``dims``."""
    return sum(2 * a * b for a, b in zip(dims[:-1], dims[1:]))


def cp_encoder_flops_per_point(cp, trained: bool = True) -> int:
    """Folded-CP encoder (ops/cp_grid.py, ops/cp_grid_pallas.py).

    Per level, per axis: a two-hot (1,Tl)x(Tl,C) interpolation matmul =
    2·Tl·C forward (6·Tl·C per level), where Tl = level_rows(R) is the
    SLICED row count the kernel actually contracts (coarse levels touch
    only R+1 rows — counting the full table here would overstate MFU).
    Useful backward work is the dlines gradient matmuls (another 6·Tl·C;
    the position cotangent is zero by contract).
    Recompute inside the backward kernel is NOT counted — MFU measures
    algorithmically necessary work, not rematerialization.
    """
    rows = sum(cp.level_rows(R) for R in cp.resolutions)
    fwd = 6 * rows * cp.n_components
    return 2 * fwd if trained else fwd


def hash_encoder_flops_per_point(grid) -> int:
    """Hash-grid encode: 8 corners x F features x (hash + lerp) ≈ 60 flops
    per corner-feature forward; gather-bound in practice (flops are not the
    bottleneck — reported for completeness). Backward ~2x.
    """
    return 3 * 60 * grid.n_levels * grid.n_features


def cp_encoder_useful_flops_per_point(cp, trained: bool = True) -> int:
    """ALGORITHMIC encoder work: the two-hot interpolation touches exactly
    2 rows per level-axis, so the useful math is 3 axes x 2 rows x C MACs
    per level — what a gather-based implementation (tiny-cuda-nn) pays.
    The full (1,T)x(T,C) matmul the MXU actually executes is T/2 x larger;
    counting it as useful flatters MFU (VERDICT r2, Weak #3). Report both:
    hardware MFU (are the MXUs busy?) uses the executed matmul count;
    useful MFU (is the algorithm efficient?) uses this."""
    fwd = 3 * 2 * 2 * cp.n_levels * cp.n_components
    return 2 * fwd if trained else fwd


def ngp_flops_per_point(ngp, trained: bool = True, useful: bool = False) -> int:
    """NGP model: encoder + density MLP + SH + color MLP. ``trained`` =
    fwd + useful bwd (dW + dx = 2x fwd for the MLPs, dlines for the
    encoder); False = forward only (the coarse pass when
    coarse_loss_weight resolves to 0). ``useful`` counts the CP encoder at
    algorithmic need (two touched rows per level-axis) instead of the
    executed-matmul size — everything else is identical."""
    if ngp.resolved_encoder() in ("cp", "cp_pallas", "auto"):
        enc_fn = (cp_encoder_useful_flops_per_point if useful
                  else cp_encoder_flops_per_point)
        enc = enc_fn(ngp.cp, trained=trained)
        enc_dim = ngp.cp.out_dim
    else:
        enc = hash_encoder_flops_per_point(ngp.grid)
        enc_dim = ngp.grid.out_dim
    density_dims = [enc_dim] + [ngp.density_width] * ngp.density_layers + [ngp.density_out]
    sh_dim = ngp.sh_degree**2
    color_dims = (
        [ngp.density_out - 1 + sh_dim]
        + [ngp.color_width] * ngp.color_layers
        + [3]
    )
    mlps_fwd = _mlp_fwd(density_dims) + _mlp_fwd(color_dims)
    sh = 2 * sh_dim  # polynomial eval, ~2 flops/coefficient
    compositing = 100  # alpha/transmittance/accumulation per point
    return enc + (3 if trained else 1) * mlps_fwd + sh + compositing


def ngp_useful_flops_per_point(ngp, trained: bool = True) -> int:
    """ngp_flops_per_point with the encoder counted at algorithmic need."""
    return ngp_flops_per_point(ngp, trained=trained, useful=True)


def train_step_useful_flops(cfg, n_rays: int) -> float:
    """train_step_flops at algorithmic (useful) encoder cost — the honest
    numerator for 'how close is the ALGORITHM to speed of light'."""
    return train_step_flops(cfg, n_rays, useful=True)


def classic_flops_per_point(model_cfg, use_viewdirs: bool = True) -> int:
    """FlexibleNeRF: positional encodings + trunk + dir branch, fwd+bwd.

    Honors the checkpoint-exact 4-layer trunk (models/flexible_nerf.py):
    layer1 + 3 trunk layers + fc_feat (+ dir branch when use_viewdirs).
    """
    w = model_cfg.hidden_size
    xyz_dim = 3 * (1 + 2 * model_cfg.num_encoding_fn_xyz)
    dir_dim = 3 * (1 + 2 * model_cfg.num_encoding_fn_dir)
    pe = 4 * (xyz_dim + (dir_dim if use_viewdirs else 0))  # sin+cos evals
    dims = [xyz_dim, w, w, w, w]  # layer1 + layers_xyz.{0,1,2}
    fwd = _mlp_fwd(dims) + 2 * w * w  # + fc_feat
    if use_viewdirs:
        fwd += 2 * (w + dir_dim) * (w // 2) + 2 * (w // 2) * 3 + 2 * w * 1
    else:
        fwd += 2 * w * 4
    return pe + 3 * fwd + 100


def train_step_flops(cfg, n_rays: int, useful: bool = False) -> float:
    """Total training-step FLOPs for ``n_rays`` rays under ``cfg``.

    Honors coarse_loss_weight: when it resolves to 0 on the NGP engine the
    coarse pass is forward-only (train/loop.py), so its points are counted
    at forward cost — analytic MFU stays honest. ``useful`` switches the
    encoder term to algorithmic cost (see ngp_flops_per_point).
    """
    s = cfg.nerf.train
    if cfg.engine == "ngp":
        cw = float(cfg.nerf.coarse_loss_weight)
        coarse_trained = s.num_fine == 0 or (cw != 0.0 and cw >= 0.0)
        coarse = n_rays * s.num_coarse * ngp_flops_per_point(
            cfg.ngp, trained=coarse_trained, useful=useful
        )
        fine = n_rays * s.num_fine * ngp_flops_per_point(
            cfg.ngp, useful=useful
        )
        return float(coarse + fine)
    # classic: coarse samples through coarse model, coarse+fine through fine.
    per_point = classic_flops_per_point(cfg.model_coarse, cfg.nerf.use_viewdirs)
    coarse_pts = n_rays * s.num_coarse
    fine_pts = n_rays * (s.num_coarse + s.num_fine) if s.num_fine > 0 else 0
    return float(coarse_pts + fine_pts) * per_point
