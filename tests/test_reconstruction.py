"""Tests for the reconstruction side-pipeline (L7)."""

import numpy as np
import pytest

from deepearth_tpu.reconstruction import (
    CameraIntrinsics,
    GeoFusionDataset,
    depth_to_world_cloud,
    load_ply,
    save_ply,
    transform_points,
    unproject_depth,
    voxel_downsample,
)


@pytest.fixture
def intrinsics():
    return CameraIntrinsics(fx=100.0, fy=100.0, cx=32.0, cy=24.0, width=64, height=48)


class TestUnprojection:
    def test_center_pixel_on_axis(self, intrinsics):
        depth = np.zeros((48, 64), np.float32)
        depth[24, 32] = 5.0
        pts = unproject_depth(depth, intrinsics)
        assert pts.shape == (1, 3)
        np.testing.assert_allclose(pts[0], [0.0, 0.0, 5.0])

    def test_offset_pixel_geometry(self, intrinsics):
        depth = np.zeros((48, 64), np.float32)
        depth[24, 42] = 10.0  # 10 px right of center
        pts = unproject_depth(depth, intrinsics)
        np.testing.assert_allclose(pts[0], [1.0, 0.0, 10.0])  # 10px/fx*d = 1m

    def test_invalid_depth_dropped(self, intrinsics):
        depth = np.full((48, 64), -1.0, np.float32)
        depth[0, 0] = 2.0
        depth[1, 1] = 100.0
        pts = unproject_depth(depth, intrinsics, max_depth=50.0)
        assert pts.shape == (1, 3)

    def test_world_transform(self, intrinsics):
        depth = np.zeros((48, 64), np.float32)
        depth[24, 32] = 1.0
        R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])  # Rz(90°)
        t = np.array([10.0, 20.0, 30.0])
        cloud = depth_to_world_cloud(depth, intrinsics, R, t, stride=1)
        np.testing.assert_allclose(cloud[0], [10.0, 20.0, 31.0])


class TestPointCloudUtils:
    def test_voxel_downsample(self):
        pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [5.0, 5.0, 5.0]])
        out = voxel_downsample(pts, 1.0)
        assert out.shape == (2, 3)
        np.testing.assert_allclose(sorted(out[:, 0]), [0.15, 5.0])

    def test_ply_roundtrip(self, tmp_path):
        pts = np.random.default_rng(0).random((10, 3))
        cols = (np.random.default_rng(1).random((10, 3)) * 255).astype(np.uint8)
        p = str(tmp_path / "cloud.ply")
        save_ply(p, pts, cols)
        pts2, cols2 = load_ply(p)
        np.testing.assert_allclose(pts2, pts, atol=1e-5)
        np.testing.assert_array_equal(cols2, cols)


class TestGeoFusionDataset:
    def test_dataset_poses(self, tmp_path):
        csv_text = (
            "time,image,latitude,longitude,altitude,yaw,pitch,roll,"
            "xyAccuracy,zAccuracy\n"
            "1.0,f1,28.50,-81.40,30.0,0.0,0.0,0.0,0.01,0.02\n"
            "2.0,f2,28.51,-81.41,31.0,90.0,0.0,0.0,0.01,0.02\n"
        )
        csv_path = tmp_path / "poses.csv"
        csv_path.write_text(csv_text)
        # image dir with one matching file
        (tmp_path / "f1.jpg").write_bytes(b"")
        ds = GeoFusionDataset(str(csv_path), image_dir=str(tmp_path))
        assert len(ds) == 2
        f0 = ds[0]
        assert f0.image_path is not None and f0.image_path.endswith("f1.jpg")
        assert ds[1].image_path is None
        # rotations are proper
        np.testing.assert_allclose(
            np.linalg.det(f0.rotation_cam_to_ecef), 1.0, atol=1e-10
        )
        poses = ds.poses()
        assert poses["positions_ecef"].shape == (2, 3)
        assert poses["positions_norm"].min() >= 0
        assert poses["positions_norm"].max() <= 1


class TestGaussianSplat:
    def _cam(self, w=32, h=32):
        import jax.numpy as jnp
        from deepearth_tpu.reconstruction import Camera

        return Camera(
            rotation=jnp.eye(3), translation=jnp.asarray([0.0, 0.0, 2.0]),
            fx=32.0, fy=32.0, cx=w / 2, cy=h / 2, width=w, height=h,
        )

    def test_quat_rotmat(self):
        import jax.numpy as jnp
        from deepearth_tpu.reconstruction import quat_to_rotmat

        R = quat_to_rotmat(jnp.asarray([1.0, 0.0, 0.0, 0.0]))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
        # 90° about z: w=cos45, z=sin45
        s = np.sin(np.pi / 4)
        Rz = quat_to_rotmat(jnp.asarray([np.cos(np.pi / 4), 0.0, 0.0, s]))
        np.testing.assert_allclose(
            np.asarray(Rz) @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6
        )

    def test_projection_geometry(self):
        import jax
        import jax.numpy as jnp
        from deepearth_tpu.reconstruction import init_scene, project_gaussians

        scene = init_scene(jax.random.PRNGKey(0), 4)
        # a gaussian at the optical axis projects to the image centre
        scene = scene._replace(
            means=scene.means.at[0].set(jnp.asarray([0.0, 0.0, 0.0]))
        )
        cam = self._cam()
        xy, cov2d, depth = project_gaussians(scene, cam)
        np.testing.assert_allclose(np.asarray(xy[0]), [16.0, 16.0], atol=1e-4)
        assert float(depth[0]) == pytest.approx(2.0)
        # 2D covariances are symmetric positive definite
        c = np.asarray(cov2d)
        assert np.all(np.linalg.eigvalsh(c) > 0)

    def test_render_shapes_and_compositing(self):
        import jax
        from deepearth_tpu.reconstruction import init_scene, render
        import jax.numpy as jnp

        cam = self._cam()
        scene = init_scene(jax.random.PRNGKey(1), 16)
        img = render(scene, cam, background=jnp.asarray([0.2, 0.2, 0.2]))
        a = np.asarray(img)
        assert a.shape == (32, 32, 3)
        assert np.isfinite(a).all()
        assert a.min() >= 0.0 and a.max() <= 1.0 + 1e-5

    def test_fit_scene_reduces_loss(self):
        """Differentiable end-to-end: random init must fit a rendered target."""
        import jax
        import jax.numpy as jnp
        from deepearth_tpu.reconstruction import (
            fit_scene, init_scene, render,
        )

        cam = self._cam(24, 24)
        # target rendered from a known scene
        true_scene = init_scene(jax.random.PRNGKey(7), 8, extent=0.5)
        true_scene = true_scene._replace(
            opacity_logits=jnp.full((8,), 2.0),
            colors=jax.random.normal(jax.random.PRNGKey(8), (8, 3)),
        )
        target = render(true_scene, cam)
        scene0 = init_scene(jax.random.PRNGKey(0), 32, extent=0.5)
        img0 = render(scene0, cam)
        loss0 = float(jnp.mean((img0 - target) ** 2))
        _, loss = fit_scene(target, cam, n_gaussians=32, steps=120, seed=0,
                            extent=0.5)
        assert loss < loss0 * 0.5, f"{loss0} → {loss}"

    def test_densify_and_prune_ops(self):
        import jax
        import jax.numpy as jnp
        from deepearth_tpu.reconstruction import (
            densify_and_prune, init_scene, reset_opacity,
        )

        scene = init_scene(jax.random.PRNGKey(0), 8, extent=0.5)
        # rows 0-1 low opacity (pruned); row 2 small+high-grad (cloned);
        # row 3 big+high-grad (split into 2)
        scene = scene._replace(
            opacity_logits=jnp.asarray([-9.0, -9.0, 2.0, 2.0, 0.0, 0.0, 0.0, 0.0]),
            log_scales=scene.log_scales.at[3].set(jnp.log(0.2)),
        )
        grads = jnp.asarray([1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0]) * 1e-2
        new, src = densify_and_prune(
            scene, grads, jax.random.PRNGKey(1),
            grad_threshold=1e-3, split_scale=0.15, min_opacity=0.01,
        )
        # 8 - 2 pruned - 1 split-removed + 1 clone + 2 children = 8
        assert new.means.shape[0] == 8
        assert (src == 2).sum() == 2  # clone keeps a duplicate of row 2
        assert (src == 3).sum() == 2  # split spawns two children of row 3
        # split children shrink
        child_scales = np.exp(np.asarray(new.log_scales[src == 3]))
        assert (child_scales < 0.2).all()
        # opacity reset caps everything at the reset value
        r = reset_opacity(new, 0.01)
        assert float(jax.nn.sigmoid(r.opacity_logits).max()) <= 0.0101

    @pytest.mark.slow
    def test_densification_beats_fixed_count(self):
        """Adaptive density control reaches a better fit than a fixed-count
        scene with the same FINAL Gaussian budget (VERDICT round-1 item 8;
        reference: reconstruction/gaussian_splat.py:44-60)."""
        import jax
        import jax.numpy as jnp
        from deepearth_tpu.reconstruction import (
            fit_scene, fit_scene_adaptive, init_scene, render,
        )

        cam = self._cam(24, 24)
        # concentrated structure: a tight cluster of bright Gaussians
        true_scene = init_scene(jax.random.PRNGKey(3), 12, extent=0.15)
        true_scene = true_scene._replace(
            opacity_logits=jnp.full((12,), 2.5),
            colors=jax.random.normal(jax.random.PRNGKey(4), (12, 3)) * 2,
        )
        target = render(true_scene, cam)

        adaptive_scene, adaptive_loss = fit_scene_adaptive(
            target, cam, n_init=8, steps=360, densify_every=90,
            lr=2e-2, seed=0, extent=0.5,
            grad_threshold=1e-4, split_scale=0.08,
        )
        final_g = adaptive_scene.means.shape[0]
        assert final_g > 8, "densification never grew the scene"
        _, fixed_loss = fit_scene(
            target, cam, n_gaussians=final_g, steps=360, seed=0, extent=0.5
        )
        assert adaptive_loss < fixed_loss, (
            f"adaptive {adaptive_loss:.5f} vs fixed {fixed_loss:.5f} "
            f"at G={final_g}"
        )

    def test_tiled_matches_dense(self):
        """render_tiled reproduces the dense rasterizer when every
        intersecting Gaussian fits in the per-tile budget."""
        import jax
        import jax.numpy as jnp
        from deepearth_tpu.reconstruction import init_scene, render, render_tiled

        cam = self._cam()
        scene = init_scene(jax.random.PRNGKey(5), 120)
        bg = jnp.asarray([0.2, 0.3, 0.4])
        dense = np.asarray(render(scene, cam, bg))
        tiled = np.asarray(
            render_tiled(scene, cam, bg, tile_size=16, max_per_tile=120)
        )
        # only divergence is the radius_sigma tail cutoff (≈2e-3 of peak α)
        np.testing.assert_allclose(tiled, dense, atol=5e-3)

    def test_tiled_budget_truncation_and_errors(self):
        import jax
        import jax.numpy as jnp
        from deepearth_tpu.reconstruction import init_scene, render, render_tiled

        cam = self._cam()
        scene = init_scene(jax.random.PRNGKey(6), 64)
        bg = jnp.asarray([0.0, 0.0, 0.0])
        # tight budget: closest-in-depth K are kept; image stays valid
        img = np.asarray(render_tiled(scene, cam, bg, max_per_tile=8))
        assert np.isfinite(img).all() and img.min() >= 0.0
        with pytest.raises(ValueError):
            render_tiled(scene, cam, tile_size=24)  # 32 % 24 != 0

    def test_tiled_scales_past_dense_cap_and_trains(self):
        """A scene far beyond the dense rasterizer's practical cap renders
        under the tiled path, and its train step reduces loss (gradients
        flow through the per-tile top-k gathers)."""
        import jax
        import jax.numpy as jnp
        from deepearth_tpu.reconstruction import init_scene, render_tiled
        from deepearth_tpu.reconstruction.gaussian_splat import make_train_step

        cam = self._cam()
        big = init_scene(jax.random.PRNGKey(7), 30_000, extent=1.0)
        img = np.asarray(
            jax.jit(lambda s: render_tiled(s, cam, max_per_tile=128))(big)
        )
        assert img.shape == (32, 32, 3) and np.isfinite(img).all()

        target = jnp.zeros((32, 32, 3))
        scene = init_scene(jax.random.PRNGKey(8), 512)
        init, step = make_train_step(cam, lr=2e-2, renderer="tiled")
        opt = init(scene)
        scene, opt, l0 = step(scene, opt, target)
        for _ in range(30):
            scene, opt, loss = step(scene, opt, target)
        assert float(loss) < float(l0)


class TestVisualize:
    def test_all_plots_write_png(self, tmp_path):
        from deepearth_tpu.reconstruction import (
            plot_attention_map,
            plot_observation_map,
            plot_point_cloud,
            save_render,
        )

        rng = np.random.default_rng(0)
        p1 = plot_observation_map(
            28 + rng.random(50), -81 + rng.random(50),
            color_by=rng.integers(0, 5, 50),
            path=str(tmp_path / "obs.png"),
        )
        p2 = plot_point_cloud(
            rng.random((100, 3)), path=str(tmp_path / "cloud.png")
        )
        p3 = save_render(rng.random((16, 16, 3)), str(tmp_path / "r.png"))
        p4 = plot_attention_map(rng.random((8, 8)), str(tmp_path / "a.png"))
        import os

        for p in (p1, p2, p3, p4):
            assert os.path.getsize(p) > 1000
