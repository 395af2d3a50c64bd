"""Golden-value geospatial precision tests.

Ports the reference's strongest test discipline
(reference: geospatial/tests/geospatial_tests.py:50-699): landmark precision,
geodetic↔ECEF↔normalized round trips with sub-micrometer error accounting,
CSV round-trip IO.
"""

import os

import numpy as np
import pytest

from deepearth_tpu.geospatial import (
    BoundingBox,
    CoordinateSet,
    GeoFusionDataLoader,
    GeoOrientation,
    GeospatialConverter,
    ecef_to_geodetic,
    geodetic_to_ecef,
    rotation_to_ypr,
    safe_div,
    wrap_lat,
    wrap_lat_error,
    wrap_lon_error,
    ypr_to_rotation,
)

# Ecological landmarks (lat, lon, alt) incl. polar / antimeridian edge cases.
LANDMARKS = np.array(
    [
        [28.5, -81.4, 30.0],      # Central Florida
        [37.7749, -122.4194, 10.0],
        [51.5007, -0.1246, 35.0],
        [-33.8688, 151.2093, 58.0],
        [0.0, 0.0, 0.0],          # Gulf of Guinea origin
        [89.9999, 45.0, 100.0],   # near north pole
        [-89.9999, -135.0, 0.0],  # near south pole
        [0.0, 179.99999, -50.0],  # near antimeridian
        [35.6762, 139.6503, 40.0],
        [-13.1631, -72.5450, 2430.0],  # Machu Picchu
    ],
    dtype=np.float64,
)


class TestRoundTrip:
    def test_geodetic_ecef_roundtrip_submicrometer(self):
        xyz = geodetic_to_ecef(LANDMARKS)
        geo2 = ecef_to_geodetic(xyz)
        xyz2 = geodetic_to_ecef(geo2)
        # position error in meters after full round trip
        err_m = np.linalg.norm(xyz2 - xyz, axis=-1)
        assert np.all(err_m < 1e-6), f"max round-trip error {err_m.max():.2e} m"

    def test_geodetic_values_recovered(self):
        xyz = geodetic_to_ecef(LANDMARKS)
        geo2 = ecef_to_geodetic(xyz)
        lat_err = wrap_lat_error(LANDMARKS[:, 0], geo2[:, 0])
        lon_err = wrap_lon_error(LANDMARKS[:, 1], geo2[:, 1], LANDMARKS[:, 0])
        alt_err = np.abs(LANDMARKS[:, 2] - geo2[:, 2])
        assert np.all(lat_err < 1e-9)
        assert np.all(lon_err < 1e-9)
        assert np.all(alt_err < 1e-6)

    def test_known_ecef_origin(self):
        # (0, 0, 0) geodetic → (a, 0, 0) ECEF
        xyz = geodetic_to_ecef(np.array([0.0, 0.0, 0.0]))
        np.testing.assert_allclose(xyz, [6_378_137.0, 0.0, 0.0], atol=1e-9)

    def test_norm_roundtrip_float64(self):
        conv = GeospatialConverter()
        xyz = geodetic_to_ecef(LANDMARKS)
        norm = conv.xyz_to_norm(xyz)
        assert norm.min() >= 0.0 and norm.max() <= 1.0
        xyz2 = conv.norm_to_xyz(norm)
        err = np.abs(xyz2 - xyz)
        assert err.max() < 1e-6, f"norm round-trip error {err.max():.2e} m"

    def test_norm_dtype_auto_upgrade(self):
        # A continental-scale span cannot be represented at float16 precision;
        # the converter must auto-upgrade (reference: geo2xyz.py:291-325).
        conv = GeospatialConverter(norm_dtype=np.float16)
        xyz = geodetic_to_ecef(LANDMARKS)
        norm = conv.xyz_to_norm(xyz)
        assert norm.dtype in (np.float32, np.float64)

    def test_degenerate_span_maps_to_half(self):
        conv = GeospatialConverter()
        pts = np.tile(geodetic_to_ecef(np.array([[28.5, -81.4, 30.0]])), (4, 1))
        norm = conv.xyz_to_norm(pts)
        np.testing.assert_allclose(norm, 0.5)


class TestOrientation:
    def test_ypr_rotation_roundtrip(self):
        ypr = np.array([[10.0, 20.0, 30.0], [-45.0, 5.0, 0.0], [120.0, -30.0, 60.0]])
        R = ypr_to_rotation(ypr)
        # proper rotation matrices
        dets = np.linalg.det(R)
        np.testing.assert_allclose(dets, 1.0, atol=1e-12)
        ypr2 = rotation_to_ypr(R)
        np.testing.assert_allclose(ypr2, ypr, atol=1e-9)

    def test_orientation_matrix_structure(self):
        R = GeoOrientation(0.0, 0.0, 0.0).to_rotation_matrix()
        np.testing.assert_allclose(R, np.eye(3), atol=1e-15)

    def test_converter_returns_camera_rotation(self):
        conv = GeospatialConverter()
        geo = LANDMARKS[:3]
        ori = np.array([[0.0, 0.0, 0.0], [90.0, 0.0, 0.0], [10.0, -5.0, 3.0]])
        xyz, R = conv.geodetic_to_xyz(geo, orientation=ori)
        assert R.shape == (3, 3, 3)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)


class TestUtils:
    def test_wrap_lat(self):
        assert wrap_lat(91.0) == pytest.approx(89.0)
        assert wrap_lat(-91.0) == pytest.approx(-89.0)
        assert wrap_lat(45.0) == pytest.approx(45.0)
        assert wrap_lat(181.0) == pytest.approx(-1.0)

    def test_safe_div(self):
        out = safe_div(np.array([1.0, 2.0]), np.array([0.0, 2.0]))
        np.testing.assert_allclose(out, [0.5, 1.0])

    def test_wrap_lon_error_antimeridian(self):
        err = wrap_lon_error(np.array([179.9]), np.array([-179.9]), np.array([0.0]))
        assert err[0] == pytest.approx(0.2, abs=1e-9)


class TestIO:
    def test_csv_roundtrip(self, tmp_path):
        conv = GeospatialConverter()
        geo = LANDMARKS[:4]
        xyz, _ = conv.geodetic_to_xyz(geo)
        norm = conv.xyz_to_norm(xyz)
        coords = [
            CoordinateSet(
                lat=geo[i, 0], lon=geo[i, 1], alt=geo[i, 2],
                x=xyz[i, 0], y=xyz[i, 1], z=xyz[i, 2],
                rel_x=norm[i, 0], rel_y=norm[i, 1], rel_z=norm[i, 2],
                bbox=conv.bbox,
                timestamp=1700000000.0 + i,
                orientation=GeoOrientation(1.0 * i, 2.0 * i, 3.0 * i),
            )
            for i in range(4)
        ]
        path = str(tmp_path / "coords.csv")
        conv.export_coordinates(path, coords)
        loaded = conv.import_coordinates(path)
        assert len(loaded) == 4
        for a, b in zip(coords, loaded):
            assert b.lat == pytest.approx(a.lat, abs=1e-12)
            assert b.x == pytest.approx(a.x, abs=1e-6)
            assert b.rel_z == pytest.approx(a.rel_z, abs=1e-12)
            assert b.orientation.yaw == pytest.approx(a.orientation.yaw)

    def test_geofusion_loader(self, tmp_path):
        csv_text = (
            "time,image,latitude,longitude,altitude,yaw,pitch,roll,xyAccuracy,zAccuracy\n"
            "1700000000.0,img_001,28.5,-81.4,30.0,10.0,2.0,-1.0,0.01,0.02\n"
            "1700000001.0,img_002,28.6,-81.5,31.0,11.0,2.5,-0.5,0.01,0.02\n"
        )
        p = tmp_path / "geofusion.csv"
        p.write_text(csv_text)
        conv = GeospatialConverter()
        loader = GeoFusionDataLoader(conv, data_dir=str(tmp_path))
        loader.load_csv("geofusion.csv")
        pos, ori = loader.convert_all()
        assert pos.shape == (2, 3) and ori.shape == (2, 3)
        assert loader.entries[0].image_name == "img_001.jpg"
        xyz, R = conv.geodetic_to_xyz(pos, orientation=ori)
        assert xyz.shape == (2, 3) and R.shape == (2, 3, 3)


class TestBoundingBox:
    def test_from_points_and_union(self):
        a = BoundingBox.from_points(np.array([[0.0, 0.0, 0.0], [1.0, 2.0, 3.0]]))
        b = BoundingBox.from_points(np.array([[-1.0, 5.0, 1.0]]))
        u = a.union(b)
        np.testing.assert_allclose(u.min_point, [-1.0, 0.0, 0.0])
        np.testing.assert_allclose(u.max_point, [1.0, 5.0, 3.0])
