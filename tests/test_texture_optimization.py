"""Texture-map optimization (preprocessing/texture_optimization.py):
reference texture_map_optimization.py capability, TPU-native.

Hermetic setup: a colored planar grid mesh, synthetic pinhole cameras
looking at it, frames rendered by splatting projected vertex colors/depths
(dense enough that bilinear resampling is close to exact).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from stinet_tpu.preprocessing.texture_optimization import (  # noqa: E402
    estimate_vertex_colors, rigid_optimize)

W, H = 64, 48
INTR = (40.0, 40.0, W / 2 - 0.5, H / 2 - 0.5)


def _grid_mesh(n=24):
    xs, ys = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n))
    verts = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3)
    colors = np.stack([0.5 + 0.5 * np.sin(3 * xs), 0.5 + 0.5 * np.cos(2 * ys),
                       0.25 + 0.5 * (xs * ys + 1) / 2], -1).reshape(-1, 3)
    return verts.astype(np.float32), colors.astype(np.float32)


def _look_at_pose(eye):
    """world->cam with camera at `eye` looking at the origin, +z forward."""
    fwd = -np.asarray(eye, np.float64)
    fwd /= np.linalg.norm(fwd)
    right = np.cross([0, 1, 0], fwd)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    r = np.stack([right, up, fwd])  # rows
    t = -r @ eye
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = r
    pose[:3, 3] = t
    return pose


def _render(verts, vcols, pose):
    """Nearest-splat color + depth frame from a dense vertex cloud."""
    cam = verts @ pose[:3, :3].T + pose[:3, 3]
    z = cam[:, 2]
    u = np.round(cam[:, 0] / z * INTR[0] + INTR[2]).astype(int)
    v = np.round(cam[:, 1] / z * INTR[1] + INTR[3]).astype(int)
    ok = (z > 0) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    color = np.zeros((H, W, 3), np.float32)
    depth = np.zeros((H, W), np.float32)
    # near-to-far so closest vertex wins the splat
    order = np.argsort(-z)
    for i in np.flatnonzero(ok)[np.argsort(-z[ok])]:
        color[v[i], u[i]] = vcols[i]
        depth[v[i], u[i]] = z[i]
    return color, depth


def _scene(n_frames=4, dense=48):
    dense_v, dense_c = _grid_mesh(dense)   # render source (dense)
    verts, true_cols = _grid_mesh(12)      # optimization target (coarse)
    eyes = [np.array([0.3 * np.cos(a), 0.3 * np.sin(a), -2.2])
            for a in np.linspace(0, 2 * np.pi, n_frames, endpoint=False)]
    poses = np.stack([_look_at_pose(e) for e in eyes])
    frames = [_render(dense_v, dense_c, p) for p in poses]
    colors = np.stack([f[0] for f in frames])
    depths = np.stack([f[1] for f in frames])
    return verts, true_cols, poses, colors, depths


def test_zero_iteration_projection_recovers_colors():
    """maximum_iteration=0 parity: the visibility-weighted projection
    reproduces the true vertex colors where observed."""
    verts, true_cols, poses, colors, depths = _scene()
    import jax.numpy as jnp
    est, ws = estimate_vertex_colors(
        jnp.asarray(verts), jnp.asarray(poses),
        jnp.zeros((len(poses), 6), jnp.float32), INTR,
        jnp.asarray(colors), jnp.asarray(depths), W, H)
    est, ws = np.asarray(est), np.asarray(ws)
    seen = ws.sum(0) > 0
    assert seen.mean() > 0.8  # most of the plane is observed
    err = np.abs(est[seen] - true_cols[seen]).mean()
    assert err < 0.08, err  # splat + bilinear tolerance


def test_rigid_optimization_improves_perturbed_poses():
    """With per-frame pose noise, the rigid stage reduces the photometric
    residual and improves color recovery vs the 0-iteration estimate."""
    verts, true_cols, poses, colors, depths = _scene()
    rng = np.random.default_rng(0)
    noisy = poses.copy()
    for i in range(1, len(poses)):  # keep frame 0 as gauge anchor
        dr = rng.normal(0, 0.03, 3)
        kx = np.array([[0, -dr[2], dr[1]], [dr[2], 0, -dr[0]],
                       [-dr[1], dr[0], 0]])
        noisy[i, :3, :3] = (np.eye(3) + kx) @ noisy[i, :3, :3]
        noisy[i, :3, 3] += rng.normal(0, 0.03, 3)

    import jax.numpy as jnp
    est0, _ = estimate_vertex_colors(
        jnp.asarray(verts), jnp.asarray(noisy),
        jnp.zeros((len(poses), 6), jnp.float32), INTR,
        jnp.asarray(colors), jnp.asarray(depths), W, H)
    err0 = np.abs(np.asarray(est0) - true_cols).mean()

    vcol, deltas, hist = rigid_optimize(
        verts, noisy, INTR, colors, depths, W, H, iters=40, lr=2e-3)
    assert hist[-1] < hist[0] * 0.9, (hist[0], hist[-1])
    err1 = np.abs(vcol - true_cols).mean()
    assert err1 < err0, (err0, err1)


def test_load_sensor_scene_pairs_by_frame_id(tmp_path):
    """A missing depth file must drop ONLY that frame, not shift every
    subsequent color/depth/pose pairing (frames are paired by extracted id,
    not by position in three independent sorted globs)."""
    from PIL import Image
    import numpy as np
    from stinet_tpu.preprocessing.texture_optimization import (
        load_sensor_scene)

    for d in ("color", "depth", "pose", "intrinsic"):
        (tmp_path / d).mkdir()
    np.savetxt(tmp_path / "intrinsic" / "intrinsic_color.txt", np.eye(4))
    for i in range(4):
        # color frame i carries intensity i so pairing is observable
        Image.fromarray(np.full((8, 8, 3), i * 10, np.uint8)).save(
            tmp_path / "color" / f"{i}.jpg")
        if i != 1:  # depth frame 1 is missing
            Image.fromarray(np.full((8, 8), 1000 * (i + 1), np.uint16)).save(
                tmp_path / "depth" / f"{i}.png")
        pose = np.eye(4)
        pose[0, 3] = i  # translation x = frame id
        np.savetxt(tmp_path / "pose" / f"{i}.txt", pose)

    colors, depths, poses, intr, w, h = load_sensor_scene(
        str(tmp_path), stride=1, height=8, width=8)
    assert colors.shape[0] == 3  # frames 0, 2, 3
    # pose translation must still match the color intensity of its frame
    for k, frame_id in enumerate((0, 2, 3)):
        w2c = poses[k]
        c2w = np.linalg.inv(w2c)
        assert abs(c2w[0, 3] - frame_id) < 1e-5
        assert abs(colors[k].mean() * 255 - frame_id * 10) < 3
        assert abs(depths[k].mean() - (frame_id + 1)) < 1e-5
