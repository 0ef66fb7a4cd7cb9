"""Fast-render path tests (rendering/fast_render.py): block layout
round-trip, PDF conditioning, and end-to-end agreement with the standard
render on a trained tiny scene (interpret-mode fused kernel on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_kinematics_tpu.data import make_synthetic_scene
from nerf_kinematics_tpu.metrics.psnr import psnr
from nerf_kinematics_tpu.models.ngp import NGPConfig
from nerf_kinematics_tpu.ops.cp_grid import CPGridConfig
from nerf_kinematics_tpu.rendering.fast_render import (
    FastRenderSettings,
    _blur_floor_pdf,
)
from nerf_kinematics_tpu.rendering.renderer import RenderSettings
from nerf_kinematics_tpu.train.config import Config, ExperimentConfig, NeRFConfig
from nerf_kinematics_tpu.train.trainer import Trainer


def test_blur_floor_pdf_conserves_support():
    w = jnp.zeros((4, 8)).at[:, 3].set(1.0)
    out = _blur_floor_pdf(w, blur=True, floor=0.01)
    out = np.asarray(out)
    # Blur spreads one bin each way; floor keeps every bin strictly positive.
    assert out[0, 3] == pytest.approx(0.5, abs=0.02)
    assert out[0, 2] > 0.2 and out[0, 4] > 0.2
    assert (out > 0).all()


def _ngp_cfg(tmpdir):
    return Config(
        engine="ngp",
        ngp=NGPConfig(
            encoder="cp_pallas", fused="on",
            use_occupancy=True, occ_resolution=16, occ_proposal="hull",
            cp=CPGridConfig(n_levels=2, n_components=8, base_resolution=4,
                            max_resolution=16, table_size=32),
            density_width=32, density_layers=2, color_width=32,
            color_layers=2,
        ),
        nerf=NeRFConfig(
            train=RenderSettings(num_coarse=12, num_fine=12,
                                 merge_hierarchical=False),
            validation=RenderSettings(num_coarse=12, num_fine=12,
                                      perturb=False,
                                      merge_hierarchical=False),
            num_random_rays=256,
        ),
        experiment=ExperimentConfig(id="fast-render", logdir=tmpdir,
                                    print_every=0, validate_every=0,
                                    save_every=0, train_iters=60),
    )


def test_fast_render_matches_standard(tmp_path):
    """After a short train, the fast path must agree with the standard
    render to a few dB (same model, same budgets; only sample placement is
    block-shared) and beat a PSNR floor against ground truth."""
    ds = make_synthetic_scene(n_views=6, resolution=24)
    trainer = Trainer(_ngp_cfg(str(tmp_path)), dataset=ds)
    res = trainer.fit()
    state = res.state

    vi = int(ds.val_idx[0])
    pose = jnp.asarray(ds.poses[vi])
    gt = ds.images[vi]

    std = trainer._render(state.params, pose, state.aux)
    fast_fn = trainer.engine.make_fast_render_fn(
        ds.intrinsics, ds.near, ds.far, ds.use_ndc
    )
    fast = fast_fn(state.params, pose, state.aux)

    img_std = np.asarray(std["rgb"])
    img_fast = np.asarray(fast["rgb"])
    assert img_fast.shape == img_std.shape == (24, 24, 3)
    assert np.isfinite(img_fast).all()
    # Same model, same budget: the two renders must be close to each other
    # (block-shared placement is the only difference)...
    agree = psnr(img_fast, img_std)
    assert agree > 25.0, f"fast vs standard render PSNR {agree:.1f}"
    # ...and the fast render must not cost more than ~1 dB vs ground truth.
    p_std = psnr(img_std, gt)
    p_fast = psnr(img_fast, gt)
    assert p_fast > p_std - 1.0, (p_fast, p_std)


def test_fast_render_fg_compaction(tmp_path):
    """fg_fraction < 1 runs the fine pass only on the top-K opaque blocks:
    with K comfortably above the object's coverage the compacted render
    must match the uncompacted fast render almost exactly (background
    blocks keep a coarse composite that already equals the final image),
    and the selected blocks must reproduce the fine results bit-for-bit."""
    ds = make_synthetic_scene(n_views=6, resolution=24)
    trainer = Trainer(_ngp_cfg(str(tmp_path)), dataset=ds)
    res = trainer.fit()
    state = res.state

    vi = int(ds.val_idx[0])
    pose = jnp.asarray(ds.poses[vi])

    full_fn = trainer.engine.make_fast_render_fn(
        ds.intrinsics, ds.near, ds.far, ds.use_ndc
    )
    fg_fn = trainer.engine.make_fast_render_fn(
        ds.intrinsics, ds.near, ds.far, ds.use_ndc,
        settings=FastRenderSettings(
            num_coarse=12, num_fine=12, fg_fraction=0.75
        ),
    )
    full = np.asarray(full_fn(state.params, pose, state.aux)["rgb"])
    comp = np.asarray(fg_fn(state.params, pose, state.aux)["rgb"])
    assert np.isfinite(comp).all()
    agree = psnr(comp, full)
    assert agree > 30.0, f"compacted vs full fast render PSNR {agree:.1f}"


def test_cli_render_video_fast(tmp_path, capsys):
    """run_nerf --render-video --fast end to end: trains a tiny NGP scene,
    renders the dataset's novel-view path through the serving recipe, writes
    frames + reports fps."""
    import os

    from nerf_kinematics_tpu.cli.run_nerf import _render_video

    ds = make_synthetic_scene(n_views=6, resolution=24)
    ds = dataclasses.replace(ds, render_poses=np.asarray(ds.poses[:3]))
    trainer = Trainer(_ngp_cfg(str(tmp_path)), dataset=ds)
    res = trainer.fit()

    _render_video(trainer, res.state, fast=True)
    out = capsys.readouterr().out
    assert "fps render [fast]" in out
    vdir = os.path.join(trainer.rundir, "video")
    frames = [f for f in os.listdir(vdir) if f.endswith(".png")]
    assert len(frames) == 3


def test_fast_render_batch_sharded_matches_per_frame(tmp_path):
    """Frame-parallel serving: the vmapped/mesh-sharded batch renderer must
    reproduce the per-frame fast renders (frames are independent, params
    and occupancy replicated — zero inter-chip traffic)."""
    ds = make_synthetic_scene(n_views=9, resolution=24)
    trainer = Trainer(_ngp_cfg(str(tmp_path)), dataset=ds, use_mesh=True)
    assert trainer.mesh is not None  # conftest provides 8 CPU devices
    res = trainer.fit()
    state = res.state

    single = trainer.engine.make_fast_render_fn(
        ds.intrinsics, ds.near, ds.far, ds.use_ndc
    )
    batch = trainer.engine.make_fast_render_batch(
        ds.intrinsics, ds.near, ds.far, ds.use_ndc
    )
    poses = jnp.asarray(ds.poses[:8])  # one frame per device
    out = batch(state.params, poses, state.aux)
    assert out["rgb"].shape == (8, 24, 24, 3)
    for k in (0, 3, 7):
        ref = single(state.params, poses[k], state.aux)["rgb"]
        np.testing.assert_allclose(
            # vmap changes XLA fusion boundaries, so bf16-accumulated
            # composites differ at ~1e-4 from the single-frame render.
            np.asarray(out["rgb"][k]), np.asarray(ref), atol=2e-4
        )


def test_fast_render_requires_flagship_features(tmp_path):
    cfg = _ngp_cfg(str(tmp_path))
    ds = make_synthetic_scene(n_views=4, resolution=16)
    t = Trainer(
        cfg.replace(ngp=dataclasses.replace(cfg.ngp, use_occupancy=False)),
        dataset=ds,
    )
    with pytest.raises(ValueError, match="occupancy"):
        t.engine.make_fast_render_fn(ds.intrinsics, ds.near, ds.far, False)
