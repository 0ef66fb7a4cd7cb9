"""SfM tests: COLMAP-free pose recovery on a synthetic scene with exact
ground-truth poses (point-sprite cloud rendered with cv2 — texture-rich,
pinhole-exact), plus unit tests of the geometric core."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from nerf_kinematics_tpu.poses.sfm import (  # noqa: E402
    SfmResult,
    build_pairs,
    build_tracks,
    bundle_adjust,
    run_sfm,
    sfm_to_transforms,
    triangulate_dlt,
)


# ---------------------------------------------------------------------------
# Synthetic scene: colored point sprites, orbit camera
# ---------------------------------------------------------------------------

def _look_at(eye, target=np.zeros(3), up=np.array([0.0, 0.0, 1.0])):
    """OpenGL/NeRF c2w: -z forward, y up."""
    f = target - eye
    f = f / np.linalg.norm(f)
    r = np.cross(f, up)
    r = r / np.linalg.norm(r)
    u = np.cross(r, f)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = r, u, -f, eye
    return c2w


def _orbit(n, radius=4.0, elev_deg=25.0):
    e = np.radians(elev_deg)
    thetas = np.linspace(0, 0.6 * np.pi, n)  # ~12 deg/frame (video-like)
    return np.stack([
        _look_at(radius * np.array([
            np.cos(e) * np.cos(t), np.cos(e) * np.sin(t), np.sin(e)
        ]))
        for t in thetas
    ])


def _render_sprites(pts, patterns, c2w, H, W, focal):
    """Painter's-algorithm point-sprite render through an exact pinhole.
    Each point carries a unique random texture patch (so SIFT descriptors
    are discriminative — uniform disks all look alike under a ratio test)."""
    w2c = np.linalg.inv(c2w)
    xc = (w2c[:3, :3] @ pts.T).T + w2c[:3, 3]
    # NeRF camera: -z forward; pixel u = f*x/-z + cx, v = f*(-y)/-z + cy.
    z = -xc[:, 2]
    vis = z > 0.5
    u = focal * xc[:, 0] / z + W / 2.0
    v = focal * (-xc[:, 1]) / z + H / 2.0
    img = np.full((H, W, 3), 255, np.uint8)
    order = np.argsort(-z)  # far to near
    for i in order:
        if not vis[i]:
            continue
        s = int(np.clip(focal * 0.22 / z[i], 8, 60))
        x0 = int(round(u[i])) - s // 2
        y0 = int(round(v[i])) - s // 2
        x1, y1 = x0 + s, y0 + s
        if x1 <= 0 or y1 <= 0 or x0 >= W or y0 >= H:
            continue
        patch = cv2.resize(patterns[i], (s, s),
                           interpolation=cv2.INTER_LINEAR)
        cx0, cy0 = max(0, -x0), max(0, -y0)
        cx1, cy1 = s - max(0, x1 - W), s - max(0, y1 - H)
        img[max(0, y0):min(H, y1), max(0, x0):min(W, x1)] = (
            patch[cy0:cy1, cx0:cx1]
        )
    return img


@pytest.fixture(scope="module")
def sprite_capture(tmp_path_factory):
    rng = np.random.default_rng(7)
    n_pts, n_views, H, W = 300, 10, 400, 400
    focal = 0.5 * W / np.tan(np.radians(60.0) / 2)
    pts = rng.uniform(-1, 1, (n_pts, 3))
    patterns = rng.integers(0, 255, (n_pts, 8, 8, 3)).astype(np.uint8)
    poses = _orbit(n_views)
    d = tmp_path_factory.mktemp("sfm_imgs")
    paths = []
    for i, p in enumerate(poses):
        img = _render_sprites(pts, patterns, p, H, W, focal)
        path = str(d / f"{i:03d}.png")
        cv2.imwrite(path, img)
        paths.append(path)
    return paths, poses, focal


# ---------------------------------------------------------------------------
# Unit tests
# ---------------------------------------------------------------------------

def test_build_pairs_window_and_loops():
    pairs = build_pairs(20, window=3, long_range_stride=8)
    assert (0, 1) in pairs and (0, 3) in pairs and (1, 5) not in pairs
    assert any(j - i > 3 for i, j in pairs)  # long-range pairs exist


def test_build_tracks_merges_and_drops_contradictions():
    matches = {
        (0, 1): (np.array([5]), np.array([7])),
        (1, 2): (np.array([7]), np.array([9])),
        # Contradiction: track would observe image 2 twice.
        (0, 2): (np.array([5]), np.array([11])),
    }
    tracks = build_tracks(matches)
    assert tracks == []  # the single merged track is contradictory
    del matches[(0, 2)]
    tracks = build_tracks(matches)
    assert len(tracks) == 1 and tracks[0] == {0: 5, 1: 7, 2: 9}


def test_triangulate_dlt_exact():
    X_true = np.array([0.3, -0.2, 2.5])
    K = np.array([[300.0, 0, 160], [0, 300, 160], [0, 0, 1]])
    Ps, uvs = [], []
    for tx in (-0.5, 0.0, 0.5):
        Rt = np.hstack([np.eye(3), np.array([[tx], [0], [0]])])
        P = K @ Rt
        x = P @ np.append(X_true, 1.0)
        Ps.append(P)
        uvs.append(x[:2] / x[2])
    X = triangulate_dlt(Ps, uvs)
    np.testing.assert_allclose(X, X_true, atol=1e-9)


def test_bundle_adjust_reduces_noise():
    """BA must pull noisy cameras/points back toward the exact geometry."""
    rng = np.random.default_rng(3)
    n_cams, n_pts = 6, 80
    f, cx, cy = 300.0, 160.0, 160.0
    X = rng.uniform(-1, 1, (n_pts, 3)) + np.array([0, 0, 4.0])
    rv = np.zeros((n_cams, 3))
    tv = np.stack([np.array([0.4 * i - 1.0, 0.0, 0.0]) for i in range(n_cams)])
    cam_idx = np.repeat(np.arange(n_cams), n_pts)
    pt_idx = np.tile(np.arange(n_pts), n_cams)
    uv = []
    for c in range(n_cams):
        xc = X + tv[c]
        uv.append(np.stack([f * xc[:, 0] / xc[:, 2] + cx,
                            f * xc[:, 1] / xc[:, 2] + cy], -1))
    uv = np.concatenate(uv)

    rv_n = rv + rng.normal(0, 0.01, rv.shape)
    rv_n[0] = 0  # camera 0 is the gauge
    tv_n = tv + rng.normal(0, 0.02, tv.shape)
    tv_n[0] = tv[0]
    X_n = X + rng.normal(0, 0.05, X.shape)

    _, _, _, f_out, err = bundle_adjust(
        rv_n, tv_n, X_n, cam_idx, pt_idx, uv, f, cx, cy,
        iters=1500, optimize_focal=False,
    )
    assert err < 0.5, f"BA left {err:.2f}px mean reprojection error"
    assert f_out == pytest.approx(f)


# ---------------------------------------------------------------------------
# End-to-end: recover the orbit from rendered sprites
# ---------------------------------------------------------------------------

def _align_similarity(A, B):
    """Umeyama: similarity transform mapping point set A onto B; returns
    RMS error after alignment."""
    muA, muB = A.mean(0), B.mean(0)
    A0, B0 = A - muA, B - muB
    U, S, Vt = np.linalg.svd(B0.T @ A0 / len(A))
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, d])
    R = U @ D @ Vt
    var = (A0**2).sum() / len(A)
    s = np.trace(np.diag(S) @ D) / var
    res = B0 - (s * (R @ A0.T)).T
    return float(np.sqrt((res**2).sum(1).mean()))


def test_run_sfm_recovers_orbit(sprite_capture):
    paths, gt_poses, gt_focal = sprite_capture
    result = run_sfm(paths, max_dim=640, window=4, ba_iters=1500,
                     verbose=False)
    assert len(result.registered) == len(paths), (
        f"only registered {len(result.registered)}/{len(paths)}"
    )
    # Sprite rendering quantizes patch placement to whole pixels, so ~1-2px
    # residuals are floor noise, not miscalibration.
    assert result.mean_reproj_px < 2.5

    # Camera centers must match ground truth up to a similarity transform
    # (SfM's inherent gauge freedom). Orbit radius 4 → RMS below 5% of the
    # radius catches mirror flips and chained-pose drift; sub-percent
    # accuracy is not reachable on billboard sprites (no true 3D appearance
    # change, whole-pixel patch placement) with self-calibrated focal.
    centers = result.c2w()[:, :3, 3]
    gt_centers = gt_poses[np.asarray(result.registered), :3, 3]
    rms = _align_similarity(centers, gt_centers)
    assert rms < 0.2, f"camera-center RMS after alignment: {rms:.3f}"

    # Self-calibrated focal within 10% of truth.
    assert abs(result.focal - gt_focal) / gt_focal < 0.10


def test_sfm_to_transforms_normalization(sprite_capture):
    paths, _, _ = sprite_capture
    result = run_sfm(paths, max_dim=640, window=4, ba_iters=400,
                     verbose=False)
    out = sfm_to_transforms(result, paths, target_avg_distance=4.0,
                            with_sharpness=True, verbose=False)
    assert len(out["frames"]) == len(result.registered)
    mats = np.stack([f["transform_matrix"] for f in out["frames"]])
    # Average camera distance normalized to the target.
    d = np.linalg.norm(mats[:, :3, 3], axis=1).mean()
    assert d == pytest.approx(4.0, rel=1e-6)
    assert all("sharpness" in f for f in out["frames"])
    assert out["w"] == 400 and out["fl_x"] == pytest.approx(result.focal)
