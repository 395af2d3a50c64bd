"""Tests for the spec-stack data pipeline: validation, preprocessing,
context sampling."""

import numpy as np
import pandas as pd
import pytest

from deepearth_tpu.data.pipeline import (
    ContextSamplingEngine,
    DataPreprocessor,
    DatasetLoader,
)


def geo_df(n=100, seed=0, with_nan=False):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "latitude": 28.0 + rng.random(n),
            "longitude": -81.9 + rng.random(n),
            "altitude": rng.random(n) * 50,
            "timestamp": rng.random(n),  # normalized
            "species": rng.choice(["a", "b", "c"], n),
        }
    )
    if with_nan:
        df.loc[0, "altitude"] = np.nan
    return df


class TestDatasetLoader:
    def test_geodetic_detection(self):
        r = DatasetLoader().validate(geo_df())
        assert r.ok
        assert r.coordinate_system == "geodetic"
        assert r.temporal_format == "normalized"

    def test_ecef_detection(self):
        from deepearth_tpu.geospatial import geodetic_to_ecef

        g = geo_df()
        xyz = geodetic_to_ecef(
            np.stack([g["latitude"], g["longitude"], g["altitude"]], -1)
        )
        df = pd.DataFrame({"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2]})
        r = DatasetLoader().validate(df)
        assert r.coordinate_system == "ecef"
        assert "no temporal column" in r.warnings[0]

    def test_normalized_detection(self):
        rng = np.random.default_rng(0)
        df = pd.DataFrame(
            {"x": rng.random(10), "y": rng.random(10), "z": rng.random(10)}
        )
        r = DatasetLoader().validate(df)
        assert r.coordinate_system == "normalized"

    def test_iso_datetime(self):
        df = geo_df(5)
        df["timestamp"] = ["2024-06-15T12:00:00"] * 5
        r = DatasetLoader().validate(df)
        assert r.temporal_format == "iso_datetime"

    def test_invalid_latitude(self):
        df = geo_df(5)
        df.loc[0, "latitude"] = 95.0
        r = DatasetLoader().validate(df)
        assert not r.ok
        assert "latitude" in r.errors[0]

    def test_missing_columns(self):
        r = DatasetLoader().validate(pd.DataFrame({"foo": [1]}))
        assert not r.ok

    def test_load_csv_roundtrip(self, tmp_path):
        p = str(tmp_path / "obs.csv")
        geo_df(20).to_csv(p, index=False)
        df, report = DatasetLoader().load_csv(p)
        assert len(df) == 20 and report.ok


class TestPreprocessor:
    def test_outlier_removal(self):
        df = geo_df(200)
        df.loc[0, "altitude"] = 1e9
        out = DataPreprocessor().remove_outliers(df, ["altitude"])
        assert len(out) == 199

    def test_coordinate_normalization(self):
        pre = DataPreprocessor()
        norm = pre.normalize_coordinates(geo_df(50))
        assert norm.shape == (50, 3)
        assert norm.min() >= 0 and norm.max() <= 1

    def test_modality_stats_numeric(self):
        pre = DataPreprocessor()
        v = np.random.default_rng(0).standard_normal((100, 5)) * 3 + 2
        pre.fit_modality("weather", v)
        z = pre.transform_modality("weather", v)
        np.testing.assert_allclose(z.mean(0), 0, atol=1e-5)
        np.testing.assert_allclose(z.std(0), 1, atol=1e-5)

    def test_modality_vocab(self):
        pre = DataPreprocessor()
        st = pre.fit_modality("species", ["b", "a", "c", "a"], categorical=True)
        assert st.vocab == ["a", "b", "c"]
        idx = pre.transform_modality("species", ["c", "a"])
        np.testing.assert_array_equal(idx, [2, 0])


class TestContextSampling:
    def _engine(self, n=300):
        rng = np.random.default_rng(0)
        xyzt = rng.random((n, 4)).astype(np.float32)
        species = rng.integers(0, 5, n)
        return ContextSamplingEngine(xyzt, species, context_size=16), xyzt, species

    def test_spatial_neighbors_are_close(self):
        eng, xyzt, _ = self._engine()
        nbrs = eng.spatial_neighbors(0, 8)
        assert 0 in nbrs
        d_n = np.linalg.norm(xyzt[nbrs, :3] - xyzt[0, :3], axis=1).max()
        d_all = np.linalg.norm(xyzt[:, :3] - xyzt[0, :3], axis=1)
        assert d_n <= np.percentile(d_all, 20)

    def test_temporal_neighbors(self):
        eng, xyzt, _ = self._engine()
        nbrs = eng.temporal_neighbors(5, 8)
        dt = np.abs(xyzt[nbrs, 3] - xyzt[5, 3]).max()
        assert dt <= np.percentile(np.abs(xyzt[:, 3] - xyzt[5, 3]), 20)

    def test_ecological_same_species(self):
        eng, _, species = self._engine()
        nbrs = eng.ecological_neighbors(3, 8)
        assert (species[nbrs] == species[3]).all()

    def test_mixed_context_size(self):
        eng, _, _ = self._engine()
        ctx = eng.sample_context(0)
        assert len(ctx) == 16
