"""Interactive point-cloud alignment viewer
(reference: reconstruction/interactive_visualizer.py — transform cycling,
color toggling, Euler adjustments; rebuilt as a self-contained HTML canvas
viewer for a headless zero-egress host)."""

import urllib.request

import numpy as np
import pytest

from deepearth_tpu.reconstruction import (
    GeoFusionDataset,
    ViewCloud,
    apply_view_transform,
    build_scene,
    candidate_transforms,
    euler_adjust_matrix,
    render_viewer_html,
    write_viewer,
)


class TestCandidates:
    def test_24_proper_rotations(self):
        cands = candidate_transforms()
        assert len(cands) == 24
        seen = set()
        for label, m in cands:
            np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)
            np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-12)
            seen.add(m.astype(int).tobytes())
        assert len(seen) == 24  # all distinct

    def test_identity_present(self):
        mats = [m for _, m in candidate_transforms()]
        assert any(np.array_equal(m, np.eye(3)) for m in mats)

    def test_euler_adjust(self):
        # 90° about Z maps +x → +y
        m = euler_adjust_matrix(0, 0, 90)
        np.testing.assert_allclose(m @ [1, 0, 0], [0, 1, 0], atol=1e-12)
        # order is Rz @ Ry @ Rx
        m2 = euler_adjust_matrix(10, 20, 30)
        expect = (
            euler_adjust_matrix(0, 0, 30)
            @ euler_adjust_matrix(0, 20, 0)
            @ euler_adjust_matrix(10, 0, 0)
        )
        np.testing.assert_allclose(m2, expect, atol=1e-12)


class TestAlignment:
    """The tool's purpose: only the true body→camera candidate aligns the
    per-view clouds in the world frame."""

    def _make_views(self, true_candidate):
        rng = np.random.default_rng(0)
        world = rng.normal(size=(200, 3))
        views = []
        for seed in (1, 2):
            r = np.linalg.qr(np.random.default_rng(seed).normal(size=(3, 3)))[0]
            if np.linalg.det(r) < 0:
                r[:, 0] *= -1
            t = np.random.default_rng(seed + 10).normal(size=3)
            # invert p_world = R @ C @ p_cam + t
            p_cam = (world - t) @ (r @ true_candidate)
            views.append((p_cam, r, t))
        return world, views

    def test_true_candidate_aligns(self):
        cands = candidate_transforms()
        true_label, true_m = cands[7]
        world, views = self._make_views(true_m)
        clouds = [
            apply_view_transform(p, r, t, true_m) for p, r, t in views
        ]
        np.testing.assert_allclose(clouds[0], world, atol=1e-8)
        np.testing.assert_allclose(clouds[1], world, atol=1e-8)

    def test_wrong_candidate_misaligns(self):
        cands = candidate_transforms()
        true_m = cands[7][1]
        wrong_m = cands[3][1]
        world, views = self._make_views(true_m)
        cloud = apply_view_transform(*views[0], wrong_m)
        assert np.abs(cloud - world).max() > 0.5

    def test_euler_adjust_recovers_residual(self):
        true_m = candidate_transforms()[0][1]  # some axis-aligned base
        residual = euler_adjust_matrix(5, -10, 15)
        world = np.random.default_rng(3).normal(size=(50, 3))
        r = np.eye(3)
        t = np.zeros(3)
        # data generated with base ∘ residual; viewer applies adjust ∘ candidate
        p_cam = (world - t) @ (r @ residual @ true_m)
        fixed = apply_view_transform(p_cam, r, t, true_m, adjust=residual)
        np.testing.assert_allclose(fixed, world, atol=1e-8)


def _demo_views():
    rng = np.random.default_rng(0)
    return [
        ViewCloud(
            points_cam=rng.normal(size=(100, 3)).astype(np.float32),
            colors=(rng.random((100, 3)) * 255).astype(np.uint8),
            rotation_body_to_world=np.eye(3),
            translation=np.zeros(3),
            name=f"v{i}",
        )
        for i in range(2)
    ]


class TestHtml:
    def test_render_contains_scene_and_controls(self):
        html = render_viewer_html(_demo_views())
        assert "scene-data" in html
        assert html.count('"name": "v') == 2 or '"name":"v0"' in html.replace(" ", "")
        # all 24 candidates serialized
        assert html.count('"label"') == 24
        # keyboard controls present in the JS
        for key in ("candIdx", "useImageColors", "adjust"):
            assert key in html
        assert "<script src=" not in html  # self-contained: no external assets

    def test_write_viewer(self, tmp_path):
        p = write_viewer(_demo_views(), str(tmp_path / "viewer.html"))
        text = open(p).read()
        assert text.startswith("<!doctype html>")


class TestBuildScene:
    def test_from_synthetic_dataset(self, tmp_path):
        from deepearth_tpu.reconstruction import CameraIntrinsics

        csv_text = (
            "time,image,latitude,longitude,altitude,yaw,pitch,roll,"
            "xyAccuracy,zAccuracy\n"
            "1.0,f1,28.50,-81.40,30.0,0.0,0.0,0.0,0.01,0.02\n"
            "2.0,f2,28.51,-81.41,31.0,90.0,0.0,0.0,0.01,0.02\n"
        )
        (tmp_path / "poses.csv").write_text(csv_text)
        for name in ("f1", "f2"):
            np.save(tmp_path / f"{name}.npy",
                    np.full((8, 8), 2.0, np.float32))
        ds = GeoFusionDataset(
            str(tmp_path / "poses.csv"), depth_dir=str(tmp_path),
            intrinsics=CameraIntrinsics(fx=8, fy=8, cx=4, cy=4, width=8,
                                        height=8),
        )
        views = build_scene(ds, stride=2)
        assert len(views) == 2
        assert views[0].points_cam.shape[1] == 3
        assert views[0].points_cam.dtype == np.float32
        assert views[0].colors is None  # no image dir
        # normalized positions are bbox-scale, not ECEF-scale
        assert np.abs(views[0].translation).max() <= 1.0
        html = render_viewer_html(views)
        assert "scene-data" in html


class TestServerRoute:
    def test_visualizer_route(self):
        from deepearth_tpu.serving import DashboardServer, DataService

        service = DataService(viewer_views=_demo_views())
        srv = DashboardServer(service, port=0).start()
        try:
            base = f"http://127.0.0.1:{srv.port}"
            with urllib.request.urlopen(f"{base}/visualizer", timeout=30) as r:
                body = r.read().decode()
                assert r.status == 200
                assert "scene-data" in body
        finally:
            srv.stop()

    def test_unconfigured_404(self):
        from deepearth_tpu.serving import DashboardServer, DataService

        service = DataService()
        srv = DashboardServer(service, port=0).start()
        try:
            base = f"http://127.0.0.1:{srv.port}"
            with pytest.raises(urllib.error.HTTPError):
                urllib.request.urlopen(f"{base}/visualizer", timeout=30)
        finally:
            srv.stop()
