"""Fast-NeRF engine: the Instant-NGP-class model under the same Trainer API.

Replaces the reference's C++/CUDA testbed train loop (SURVEY.md §3.3) with a
single jitted train step: random rays → stratified + self-importance
hierarchical sampling → hash encode → tiny MLPs → compositing → MSE → Adam.
The hierarchical pass reuses the SAME model (it is cheap) instead of a
separate fine network — the TPU-friendly stand-in for occupancy-grid sample
pruning, keeping shapes static (SURVEY.md §7 "hard parts").

Optimizer matches NGP practice: Adam(β2=0.99, eps=1e-15), higher lr, weight
decay on MLP weights but never on the hash table.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..models.ngp import NGPConfig, NGPModel
from .config import Config
from .loop import ClassicNerf, TrainState


class NGPEngine(ClassicNerf):
    """Same interface as ClassicNerf; single NGP model for both passes."""

    def __init__(self, cfg: Config, mesh=None, scene_bound: float = 1.0):
        # Deliberately not calling super().__init__: different model family.
        import dataclasses

        # Fast engine always uses sorted fine-only importance samples: the
        # classic merge's per-ray sort costs more than the whole model on TPU
        # (see RenderSettings.merge_hierarchical).
        cfg = cfg.replace(
            nerf=dataclasses.replace(
                cfg.nerf,
                train=dataclasses.replace(cfg.nerf.train, merge_hierarchical=False),
                validation=dataclasses.replace(
                    cfg.nerf.validation, merge_hierarchical=False
                ),
            )
        )
        self.cfg = cfg
        self.mesh = mesh
        self.scene_bound = float(scene_bound)
        self.ngp_config: NGPConfig = cfg.ngp if cfg.ngp is not None else NGPConfig()
        self.model = NGPModel(self.ngp_config)
        self.model_fine = None  # hierarchical pass shares params
        self.optimizer = self._make_optimizer(cfg)
        # Scene contraction (ops/contraction.py) — the cascade equivalent for
        # aabb_scale > 2. Resolved once, statically, per engine instance.
        mode = self.ngp_config.contraction
        # YAML parses bare on/off as booleans — normalize.
        mode = {True: "on", False: "off"}.get(mode, mode)
        self.contracted = mode == "on" or (mode == "auto" and self.scene_bound > 2.0)
        self._inner = float(self.ngp_config.contract_inner) or max(
            1.0, self.scene_bound / 4.0
        )
        # Per-instance jitted occupancy updaters, built eagerly so they are
        # explicitly keyed on this engine's model + scene_bound (jit itself
        # re-traces on aux/params shape changes).
        self._occ_update_jit = jax.jit(self._occ_update) if (
            self.ngp_config.use_occupancy
        ) else None
        self._occ_incr_jit = jax.jit(self._occ_update_incremental) if (
            self.ngp_config.use_occupancy
        ) else None

    # -- occupancy-grid coordinate maps (contracted or linear) --------------
    def _occ_to_unit(self):
        """World → [0,1]³ grid-coordinate map for the occupancy grid, or
        None for the grid's built-in linear [-bound, bound]³ map."""
        if not self.contracted:
            return None
        from ..ops.contraction import contract_to_unit

        inner = self._inner
        return lambda pts: contract_to_unit(pts, inner)

    def _occ_from_unit(self):
        if not self.contracted:
            return None
        from ..ops.contraction import unit_to_world

        inner = self._inner
        return lambda u01: unit_to_world(u01, inner)

    def _density_fn(self, params):
        def density_fn(pts):
            sigma, _ = self.model.apply(
                params["coarse"], self._to_unit(pts), method=NGPModel.density
            )
            return sigma

        return density_fn

    def _occ_update(self, aux, params, key):
        from ..ops.occupancy import update_grid

        return update_grid(aux, self._density_fn(params), key, chunk=65536,
                           from_unit=self._occ_from_unit())

    def _occ_update_incremental(self, aux, params, key):
        from ..ops.occupancy import update_grid_incremental

        return update_grid_incremental(
            aux, self._density_fn(params), key,
            n_cells=self.ngp_config.occ_incremental_cells,
            from_unit=self._occ_from_unit(),
        )

    def _make_optimizer(self, cfg: Config):
        from .loop import lr_schedule

        sched = lr_schedule(cfg)
        adam = optax.adam(learning_rate=sched, b1=0.9, b2=0.99, eps=1e-15)

        def decay_mask(params):
            # Weight-decay MLP kernels only; encoding tables (hash_table /
            # cp_lines) and biases exempt, per NGP optimizer practice.
            def keep(path, _):
                keys = [str(getattr(p, "key", "")) for p in path]
                if any(k == "hash_table" or k.startswith("cp_lines") for k in keys):
                    return False
                return not (keys and keys[-1] == "bias")

            return jax.tree_util.tree_map_with_path(keep, params)

        # optax.flatten runs Adam on ONE raveled vector instead of ~15
        # per-leaf op groups — the tcnn fused-Adam shape (reference:
        # tiny-cuda-nn src/optimizer.cu). Step-time neutral at this param
        # count (~180k: both layouts are tens of µs; an earlier 1.4 ms
        # reading was the profiler's host round-trip floor, see
        # scripts/profile_step.py), but it shrinks the HLO graph and the
        # update math is unchanged exactly
        # (tests/test_ngp.py::test_flat_optimizer_matches_per_leaf).
        # Old per-leaf checkpoints migrate on restore (io/checkpoint.py).
        # Masked weight decay stays outside: it needs the tree structure.
        return optax.chain(
            optax.add_decayed_weights(1e-6, mask=decay_mask),
            optax.flatten(adam),
        )

    # -- model application with world→unit-cube mapping --------------------
    def _to_unit(self, pts):
        if self.contracted:
            from ..ops.contraction import contract_to_unit

            return contract_to_unit(pts, self._inner)
        return pts / (2.0 * self.scene_bound) + 0.5

    @property
    def fused(self) -> bool:
        mode = self.ngp_config.fused
        # YAML parses bare on/off as booleans — normalize.
        mode = {True: "on", False: "off"}.get(mode, mode)
        return mode == "on" or (
            mode == "auto"
            and self.ngp_config.resolved_encoder() == "cp_pallas"
        )

    def _fused_params(self, flax_params):
        """Flax param dict → the raw-array structure of ngp_fused_apply_cf.
        Pure pytree restructuring: autodiff transposes it exactly, so the
        fused custom-VJP gradients land back on the flax leaves."""
        p = flax_params["params"]
        cfg = self.ngp_config
        d_names = [f"density_{i}" for i in range(cfg.density_layers - 1)]
        d_names.append("density_out")
        c_names = [f"color_{i}" for i in range(cfg.color_layers - 1)]
        c_names.append("color_out")
        return {
            "lines": p["cp_lines"],
            "dW": [p[n]["kernel"] for n in d_names],
            "db": [p[n]["bias"][:, None] for n in d_names],
            "cW": [p[n]["kernel"] for n in c_names],
            "cb": [p[n]["bias"][:, None] for n in c_names],
        }

    def _cf_inputs(self, pts, vd):
        """(..., 3) pts/vd → stop-gradiented (3, N) kernel operands.
        Positions and directions are data (the kernel's VJP returns zero
        cotangents for them anyway); stop_gradient makes that explicit AND
        lets XLA prune the whole cotangent transpose path — without it the
        zero arrays are materialized in HBM (measured 0.6 ms/step)."""
        x = jax.lax.stop_gradient(self._to_unit(pts))
        if vd is None:
            vd = jnp.zeros_like(x).at[..., 2].set(1.0)
        xt = x.reshape(-1, 3).T
        vdt = jax.lax.stop_gradient(vd).reshape(-1, 3).T
        return xt, vdt

    def apply_cf(self, params, pts, vd):
        """Channels-first fused entry for the renderer hot path:
        (params, pts (..., 3), vd) → (4, N) rgbσ (see raw2outputs_cf)."""
        from ..ops.ngp_fused_pallas import DEFAULT_BLOCK, ngp_fused_apply_cf

        xt, vdt = self._cf_inputs(pts, vd)
        return ngp_fused_apply_cf(
            self._fused_params(params), xt, vdt, self.ngp_config.cp,
            self.ngp_config.fused_block or DEFAULT_BLOCK,
            interpret=jax.default_backend() != "tpu",
        )

    def apply_sigma_cf(self, params, pts, vd):
        """Density-only channels-first entry: (4, N) with zero rgb rows.
        Used for the proposal-only coarse pass — sigma drives the
        importance PDF; color is never consumed (coarse_loss_weight 0 drops
        the coarse loss term and sample_pdf stop-gradients the weights)."""
        from ..ops.ngp_fused_pallas import DEFAULT_BLOCK, ngp_fused_sigma_cf

        xt, _ = self._cf_inputs(pts, vd)
        # stop_gradient: the kernel has no VJP, and none is wanted — the
        # coarse loss term is dropped and sample_pdf stop-gradients the
        # weights. Without this, value_and_grad still demands a JVP rule
        # while linearizing the primal trace.
        return ngp_fused_sigma_cf(
            jax.lax.stop_gradient(self._fused_params(params)),
            xt, self.ngp_config.cp,
            self.ngp_config.fused_block or DEFAULT_BLOCK,
            interpret=jax.default_backend() != "tpu",
        )

    def cf_apply_fns(self):
        """(coarse_cf, fine_cf) for render_rays — None unless fused. The
        coarse entry drops to the density-only kernel when the coarse pass
        is proposal-only (coarse_loss_weight 0 AND a fine pass exists in
        both train and validation settings): its rgb is then never read —
        skipping the color MLP + in-kernel SH basis is pure savings. The
        loss_coarse metric under this mode is the background-composite MSE
        (documented in STATUS.md), not a radiance error."""
        if not self.fused:
            return None, None
        nerf = self.cfg.nerf
        sigma_only = (
            self.resolved_coarse_loss_weight() == 0.0
            and nerf.train.num_fine > 0
            and nerf.validation.num_fine > 0
        )
        coarse = self.apply_sigma_cf if sigma_only else self.apply_cf
        return coarse, self.apply_cf

    def _fused_grads_to_tree(self, d_fused):
        """Transpose of :meth:`_fused_params`: raw fused-kernel cotangents →
        the flax param-tree structure (so optax sees the same pytree as
        ``jax.grad`` would produce)."""
        from ..ops.ngp_fused_pallas import fold_dlines

        cfg = self.ngp_config
        d_names = [f"density_{i}" for i in range(cfg.density_layers - 1)]
        d_names.append("density_out")
        c_names = [f"color_{i}" for i in range(cfg.color_layers - 1)]
        c_names.append("color_out")
        p = {"cp_lines": fold_dlines(d_fused["lines"], cfg.cp)}
        for n, w, b in zip(d_names, d_fused["dW"], d_fused["db"]):
            p[n] = {"kernel": w, "bias": b[:, 0]}
        for n, w, b in zip(c_names, d_fused["cW"], d_fused["cb"]):
            p[n] = {"kernel": w, "bias": b[:, 0]}
        return {"params": p}

    def fused_objective_fn(self, near, far, settings):
        """One-invocation train objective (ops/ngp_fused_pallas
        ``ngp_fused_train_cf``): σ-coarse proposal stage as usual, then fine
        forward + per-ray compositing + MSE + full backward in a single
        Pallas kernel. Returns a callable with the same signature/result as
        ``value_and_grad(loss_fn, has_aux=True)`` — ((loss, (loss_c,
        loss_f)), grads) — or None when the step shape isn't eligible
        (then loop.py falls back to the autodiff path).

        Eligibility mirrors the flagship step exactly: fused cp encoder,
        proposal-only coarse pass (coarse_loss_weight 0), importance fine
        samples (merge off — NGPEngine forces it), viewdirs on, no density
        noise, and a ray count divisible by the kernel's 128-ray block.
        """
        from ..ops.ngp_fused_pallas import RAYS_PER_BLOCK

        mode = getattr(self.ngp_config, "fused_train", "auto")
        mode = {True: "on", False: "off"}.get(mode, mode)
        if mode == "off":
            return None
        eligible = (
            self.fused
            and self.resolved_coarse_loss_weight() == 0.0
            and settings.num_fine > 0
            and self.cfg.nerf.use_viewdirs
            and settings.radiance_field_noise_std == 0.0
            and self.cfg.nerf.num_random_rays % RAYS_PER_BLOCK == 0
        )
        if not eligible:
            if mode == "on":
                raise ValueError(
                    "ngp.fused_train: on requires the fused cp encoder, "
                    "coarse_loss_weight 0, num_fine > 0, use_viewdirs, "
                    "noise_std 0, and num_random_rays % 128 == 0"
                )
            return None

        from ..ops.ngp_fused_pallas import ngp_fused_train_cf
        from ..ops.sampling import hierarchical_sample, stratified_sample
        from ..ops.volume_render import raw2outputs_cf

        S = settings.num_fine
        Sc = settings.num_coarse
        RB = RAYS_PER_BLOCK
        white_bg = settings.white_background

        # Whole-step kernel (proposal + σ-coarse + CDFs + fine + backward in
        # ONE invocation) — the hull-proposal linear-bound flagship shape.
        # Other shapes (no occupancy, grid/projected proposal, contracted
        # scenes) use the fine-only kernel below with the XLA coarse stage.
        # Measured A/B on v5e (flagship shape, scan-timed, floor-corrected):
        # two-kernel path 4.11 ms/step vs whole-step kernel 4.55 — the
        # separate hull-proposal and σ-coarse invocations pipeline better
        # than the monolith's serialized in-kernel stages, so "auto"/"on"
        # take the two-kernel path and "full" is the explicit opt-in.
        full = (
            mode == "full"
            and self.ngp_config.use_occupancy
            and self.ngp_config.occ_proposal == "hull"
            and not self.contracted
            and isinstance(near, (int, float))
            and isinstance(far, (int, float))
        )
        if mode == "full" and not full:
            raise ValueError(
                "ngp.fused_train: full requires the hull occupancy proposal "
                "on a non-contracted scene with static near/far"
            )
        if full:
            from ..ops.ngp_fused_pallas import ngp_fused_train_full_cf
            from ..ops.occupancy import pair_projections

            num_bins = self.ngp_config.occ_bins
            occ_floor = self.ngp_config.occ_floor
            bound = self.scene_bound

            def sample_u(key, n_rays, n_out):
                # sample_pdf's u draw (deterministic linspace under
                # perturb: false, else stratified jittered-linspace).
                if not settings.perturb:
                    u = jnp.linspace(0.0, 1.0, n_out, dtype=jnp.float32)
                    return jnp.broadcast_to(u, (n_rays, n_out))
                base = jnp.arange(n_out, dtype=jnp.float32) / n_out
                jitter = jax.random.uniform(
                    key, (n_rays, n_out), dtype=jnp.float32
                ) / n_out
                return base + jitter

            def objective_full(params, batch, key, aux):
                rays_o, rays_d, viewdirs, target = batch
                n_rays = rays_o.shape[0]
                k_strat, _k_nc, k_pdf, _k_nf = jax.random.split(key, 4)
                err, _maps, err_c, d_fused = ngp_fused_train_full_cf(
                    self._fused_params(params["coarse"]),
                    rays_o.T, rays_d.T, viewdirs.T, target.T,
                    sample_u(k_strat, n_rays, Sc).T,
                    sample_u(k_pdf, n_rays, S).T,
                    pair_projections(aux),
                    self.ngp_config.cp, S, Sc, num_bins, white_bg,
                    inv_denom=1.0 / (3.0 * n_rays),
                    near=near, far=far, bound=bound, occ_floor=occ_floor,
                    interpret=jax.default_backend() != "tpu",
                )
                loss_f = jnp.sum(err) / (3.0 * n_rays)
                loss_c = jnp.sum(err_c) / (3.0 * n_rays)
                grads = {"coarse": self._fused_grads_to_tree(d_fused)}
                return (loss_f, (loss_c, loss_f)), grads

            return objective_full

        def objective(params, batch, key, aux):
            rays_o, rays_d, viewdirs, target = batch
            n_rays = rays_o.shape[0]
            # Same key split structure as render_rays so the coarse stage
            # (and therefore loss values) match the autodiff path exactly.
            k_strat, _k_noise_c, k_pdf, _k_noise_f = jax.random.split(key, 4)
            prop = self.proposal_for(aux, near, far, settings)
            if prop is not None:
                z_coarse = prop(k_strat, rays_o, rays_d)
            else:
                z_coarse = stratified_sample(
                    k_strat, n_rays, settings.num_coarse, near, far,
                    perturb=settings.perturb, lindisp=settings.lindisp,
                )
            # Channels-first point build — the (R·Sc, 3) → (3, R·Sc)
            # transpose the channels-last build would cost is ~5 MB/step.
            from ..ops.ngp_fused_pallas import (
                DEFAULT_BLOCK,
                ngp_fused_sigma_cf,
            )

            pts_c_cf = (rays_o.T[:, :, None]
                        + rays_d.T[:, :, None] * z_coarse[None])  # (3,R,Sc)
            xt_c = jax.lax.stop_gradient(
                self._to_unit(pts_c_cf.reshape(3, -1))
                if not self.contracted
                else self._to_unit(pts_c_cf.reshape(3, -1).T).T
            )
            raw4c = ngp_fused_sigma_cf(
                jax.lax.stop_gradient(self._fused_params(params["coarse"])),
                xt_c, self.ngp_config.cp,
                self.ngp_config.fused_block or DEFAULT_BLOCK,
                interpret=jax.default_backend() != "tpu",
            )
            coarse = raw2outputs_cf(
                raw4c, z_coarse, rays_d, noise_std=0.0,
                white_background=white_bg,
            )
            loss_c = jnp.mean((coarse.rgb - target) ** 2)
            z_fine = hierarchical_sample(
                k_pdf, z_coarse, jax.lax.stop_gradient(coarse.weights), S,
                deterministic=not settings.perturb, merge=False,
            )  # (R, S), sorted

            # ---- block-sample-major kernel inputs (lane = s·128 + r) ----
            nb = n_rays // RB
            z_bsm = z_fine.reshape(nb, RB, S).transpose(0, 2, 1)  # (nb,S,RB)
            d_norm = jnp.linalg.norm(rays_d, axis=-1)  # (R,)
            dd = z_bsm[:, 1:, :] - z_bsm[:, :-1, :]
            dd = jnp.concatenate(
                [dd, jnp.full_like(dd[:, :1, :], 1e10)], axis=1
            ) * d_norm.reshape(nb, 1, RB)
            dists = dd.reshape(1, -1)
            o_cf = rays_o.T.reshape(3, nb, 1, RB)
            d_cf = rays_d.T.reshape(3, nb, 1, RB)
            pts = o_cf + d_cf * z_bsm[None]  # (3, nb, S, RB)
            if self.contracted:
                xt = self._to_unit(pts.reshape(3, -1).T).T  # needs (..., 3)
            else:
                xt = self._to_unit(pts.reshape(3, -1))  # elementwise map
            xt = jax.lax.stop_gradient(xt)
            vdt = jnp.broadcast_to(
                viewdirs.T.reshape(3, nb, 1, RB), (3, nb, S, RB)
            ).reshape(3, -1)
            tgt_cf = target.T  # (3, R)

            err, _maps, d_fused = ngp_fused_train_cf(
                self._fused_params(params["coarse"]), xt, vdt, dists,
                tgt_cf, self.ngp_config.cp, S, white_bg,
                inv_denom=1.0 / (3.0 * n_rays),
                interpret=jax.default_backend() != "tpu",
            )
            loss_f = jnp.sum(err) / (3.0 * n_rays)
            grads = {"coarse": self._fused_grads_to_tree(d_fused)}
            return (loss_f, (loss_c, loss_f)), grads

        return objective

    def resolved_coarse_loss_weight(self) -> float:
        """NGP default 0.0: passes share parameters, so the coarse MSE is a
        competing blurry objective (measured -2 dB on machina) and its
        backward kernel is pure cost; the coarse pass still runs forward
        for importance-sample placement."""
        cw = float(self.cfg.nerf.coarse_loss_weight)
        return 0.0 if cw < 0.0 else cw

    def _apply(self, params, pts, vd):
        if not self.fused:
            return self.model.apply(params, self._to_unit(pts), vd)
        from ..ops.ngp_fused_pallas import DEFAULT_BLOCK, ngp_fused_apply

        x = jax.lax.stop_gradient(self._to_unit(pts))
        if vd is None:
            vd = jnp.zeros_like(x).at[..., 2].set(1.0)
        return ngp_fused_apply(
            self._fused_params(params), x, jax.lax.stop_gradient(vd),
            self.ngp_config.cp,
            self.ngp_config.fused_block or DEFAULT_BLOCK,
            interpret=jax.default_backend() != "tpu",
        )

    def apply_coarse(self, params, pts, vd):
        return self._apply(params, pts, vd)

    def apply_fine(self, params, pts, vd):
        return self._apply(params, pts, vd)

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        seed = self.cfg.experiment.randomseed if seed is None else seed
        key = jax.random.PRNGKey(seed)
        k_m, k_loop = jax.random.split(key)
        x = jnp.zeros((1, 3))
        params = {"coarse": self.model.init(k_m, x, x)}
        opt_state = self.optimizer.init(params)
        aux = None
        if self.ngp_config.use_occupancy:
            from ..ops.occupancy import init_grid

            aux = init_grid(self.ngp_config.occ_resolution, self.scene_bound)
        from .loop import init_ema_shadow

        ema = init_ema_shadow(params, self.cfg.nerf.ema_decay)
        return TrainState(jnp.int32(0), params, opt_state, k_loop, aux, ema)

    # -- occupancy acceleration -------------------------------------------
    def proposal_for(self, aux, near, far, settings):
        if aux is None or not self.ngp_config.use_occupancy:
            return None
        from ..ops.occupancy import occupancy_sample

        to_unit = self._occ_to_unit()

        def proposal(key, rays_o, rays_d):
            return occupancy_sample(
                key, aux, rays_o, rays_d, near, far, settings.num_coarse,
                num_bins=self.ngp_config.occ_bins,
                deterministic=not settings.perturb, to_unit=to_unit,
                mode=self.ngp_config.occ_proposal,
                floor=self.ngp_config.occ_floor,
            )

        return proposal

    def update_occupancy(self, state: TrainState, full: bool = True) -> TrainState:
        """Periodic EMA refresh of the occupancy grid (call every
        ``occ_update_every`` steps from the training loop). ``full=True``
        sweeps every cell; ``full=False`` runs NGP's cheap steady-state
        maintenance (grid-wide decay + random-subset requery)."""
        if state.aux is None or self._occ_update_jit is None:
            return state
        key, sub = jax.random.split(state.key)
        fn = self._occ_update_jit if full else self._occ_incr_jit
        aux = fn(state.aux, state.params, sub)
        return state._replace(aux=aux, key=key)

    # make_train_step / make_render_fn / make_train_many inherit from
    # ClassicNerf: they only touch apply_coarse/apply_fine/optimizer and the
    # params dict, all of which this class provides. has_fine resolves to
    # False (model_fine is None) unless num_fine > 0, in which case
    # render_rays falls back to shared-parameter importance sampling.

    def _fast_render_fns(self, intrinsics, near, far, use_ndc: bool,
                         settings=None):
        """(jitted, raw) single-view fast-render closures — the raw one is
        the vmap/shard target for make_fast_render_batch."""
        import jax

        from ..cameras.rays import get_rays, ndc_rays
        from ..rendering.fast_render import (
            FastRenderSettings,
            render_image_fast,
        )

        if not self.fused:
            raise ValueError("fast render needs the fused kernel (ngp.fused)")
        if not self.ngp_config.use_occupancy:
            raise ValueError("fast render needs the occupancy proposal")
        cfg = self.cfg
        val = cfg.nerf.validation
        if settings is None:
            settings = FastRenderSettings(
                num_coarse=val.num_coarse,
                num_fine=val.num_fine or val.num_coarse,
                white_background=val.white_background,
            )
        H, W = intrinsics.height, intrinsics.width
        prop_settings = val.__class__(
            num_coarse=settings.num_coarse, perturb=False
        )

        def render_view(params, c2w, aux):
            rays_o, rays_d = get_rays(
                H, W, intrinsics.fl_x, c2w, cx=intrinsics.cx,
                cy=intrinsics.cy, focal_y=intrinsics.fl_y,
                dist=getattr(intrinsics, "distortion", None),
            )
            viewdirs = rays_d / jnp.linalg.norm(
                rays_d, axis=-1, keepdims=True
            )
            if use_ndc:
                rays_o, rays_d = ndc_rays(
                    H, W, intrinsics.fl_x, 1.0, rays_o, rays_d
                )
            return render_image_fast(
                params["coarse"], self.apply_cf, rays_o, rays_d, near, far,
                settings,
                proposal_fn=self.proposal_for(aux, near, far, prop_settings),
                viewdirs=viewdirs,
            )

        return jax.jit(render_view), render_view

    def make_fast_render_fn(self, intrinsics, near, far, use_ndc: bool,
                            settings=None):
        """Jitted serving-rate renderer (rendering/fast_render.py): shared
        stride²-block coarse pass + one fused full-image fine pass. Needs
        the fused kernel and the occupancy proposal (the flagship config);
        raises otherwise. Signature matches make_render_fn:
        (params, c2w, aux) → maps dict."""
        jitted, _ = self._fast_render_fns(intrinsics, near, far, use_ndc,
                                          settings)
        return jitted

    def make_fast_render_batch(self, intrinsics, near, far, use_ndc: bool,
                               settings=None):
        """Frame-parallel serving: (params, c2ws (F, 4, 4), aux) → maps dict
        with a leading frame axis. Frames are embarrassingly parallel, so
        multi-chip serving shards the FRAME axis over the engine's mesh
        (params/occupancy replicated, each chip rendering its frames —
        zero inter-chip traffic); single-device it is one dispatch for a
        whole pose batch (one tunnel round trip on a remote chip).
        With a mesh, F must be a multiple of the device count (pad at the
        caller with any pose; discard the padded frames).

        Frames are iterated with ``lax.map`` (sequential per frame
        on-device) and, under a mesh, ``shard_map`` splits the frame axis
        so each chip loops over its local frames — the zero-traffic
        multi-chip serving shape.

        Device time is identical to pipelined single-frame dispatch
        (controlled A/B with device-side scalar sync, v5e, 400² serving
        recipe: 30.6 vs 31.2 ms/frame — 32 fps both ways). When timing
        this path, sync with an on-device reduction: materializing the
        whole (F, H, W, 3) batch on the host pulls F × 1.9 MB through the
        dev tunnel's ~32 MB/s D2H and masquerades as a 2.5× slowdown."""
        import jax

        _, render_view = self._fast_render_fns(intrinsics, near, far,
                                               use_ndc, settings)

        def batched(params, c2ws, aux):
            return jax.lax.map(lambda c: render_view(params, c, aux), c2ws)

        if self.mesh is None:
            return jax.jit(batched)
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        fn = shard_map(
            batched, mesh=self.mesh,
            in_specs=(P(), P("data"), P()),
            out_specs=P("data"),
            check_rep=False,
        )
        return jax.jit(fn)

    def density_grid(self, params, resolution: int = 128):
        """Query σ on a regular grid over the scene AABB — feeds marching
        cubes and the occupancy diagnostics. Returns (R, R, R) densities.

        The whole grid query runs as ONE jitted dispatch (lax.map over
        plane chunks INSIDE jit). Calling lax.map eagerly here dispatched
        each of the R plane chunks as a separate device round-trip, which
        over the remote-chip tunnel cost ~600 s at 256³ — vs ~1 s jitted.
        """
        if not hasattr(self, "_density_grid_jit"):
            self._density_grid_jit = {}
        fn = self._density_grid_jit.get(resolution)
        if fn is None:
            b = self.scene_bound

            def grid_fn(params):
                lin = jnp.linspace(-b, b, resolution)
                # Axis order contract: grid[i, j, k] = sigma(x=lin[i],
                # y=lin[j], z=lin[k]) — both mesh extractors
                # ((x*ny + y)*nz + z in native/mesh_extract.cpp and the
                # numpy fallback) place vertex x along axis 0.
                # meshgrid('ij') output n varies along axis n.
                xs, ys, zs = jnp.meshgrid(lin, lin, lin, indexing="ij")
                pts = jnp.stack([xs, ys, zs], axis=-1).reshape(-1, 3)

                def chunk_density(p):
                    sigma, _ = self.model.apply(
                        params["coarse"], self._to_unit(p),
                        method=NGPModel.density,
                    )
                    return sigma

                chunks = pts.reshape(resolution, resolution * resolution, 3)
                sigmas = jax.lax.map(chunk_density, chunks)
                return sigmas.reshape(resolution, resolution, resolution)

            fn = jax.jit(grid_fn)
            self._density_grid_jit[resolution] = fn
        return fn(params)
