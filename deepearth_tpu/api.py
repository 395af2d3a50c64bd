"""Simple user-facing API (reference: deepearth_api.py:17-328).

One-liner data-source registration and prediction:

    >>> from deepearth_tpu.api import DeepEarth
    >>> earth = DeepEarth()
    >>> earth.register("temperature", shape=(1,), type="numerical")
    >>> earth.register("species", type="categorical", num_classes=232)
    >>> emb = earth.predict(location=(28.5, -81.4), time="2024-06-15",
    ...                     data={"temperature": [22.3]})

Prediction returns the fused representation; reconstruction heads are
available via ``predict_batch(..., return_reconstructions=True)``.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import pickle
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .configs import DeepEarthConfig, Grid4DConfig, ModalityConfig, TransformerConfig
from .models import DeepEarthModel


def _parse_time(t: Union[str, float, _dt.datetime, None]) -> float:
    """Time → normalized [0,1] over 2000-2050 (naive, matching the
    reference's simple coordinate prep — deepearth_api.py:240-268)."""
    if t is None:
        return 0.5
    if isinstance(t, (int, float)):
        return float(np.clip(t, 0.0, 1.0))
    if isinstance(t, str):
        t = _dt.datetime.fromisoformat(t)
    if isinstance(t, _dt.datetime):
        start = _dt.datetime(2000, 1, 1)
        end = _dt.datetime(2050, 1, 1)
        return float(
            np.clip((t - start).total_seconds() / (end - start).total_seconds(), 0, 1)
        )
    raise TypeError(f"cannot parse time {t!r}")


def load_file(path: str) -> np.ndarray:
    """Load a data file into an array. CSV/NPY/NPZ natively; GeoTIFF and
    NetCDF require optional libraries not baked into this image
    (reference supports them via rasterio/netCDF4 — deepearth_api.py:270)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npy":
        return np.load(path)
    if ext == ".npz":
        data = np.load(path)
        return data[list(data.files)[0]]
    if ext == ".csv":
        return np.genfromtxt(path, delimiter=",", skip_header=1)
    if ext in (".tif", ".tiff"):
        return load_geotiff(path)
    if ext in (".nc", ".nc4"):
        return load_netcdf(path)
    raise ValueError(f"unsupported file type {ext}")


def load_geotiff(path: str) -> np.ndarray:
    """GeoTIFF → (bands, H, W) array (reference: deepearth_api.py:270).

    rasterio if available (reads CRS-aware rasters), otherwise PIL's TIFF
    reader (pixel data only — geo metadata is ignored, which matches how the
    reference used the raster: as a plain array)."""
    try:
        import rasterio

        with rasterio.open(path) as src:
            return src.read()
    except ImportError:
        from PIL import Image

        img = np.asarray(Image.open(path))
        if img.ndim == 2:
            return img[None]
        return np.moveaxis(img, -1, 0)  # (H, W, C) → (C, H, W)


def load_netcdf(path: str, variable: Optional[str] = None) -> np.ndarray:
    """NetCDF → array of ``variable`` (default: first non-coordinate var).

    netCDF4/xarray if available (NetCDF-4/HDF5), otherwise scipy's stdlib
    NetCDF-3 reader (reference: deepearth_api.py:270)."""
    try:
        import netCDF4  # type: ignore

        with netCDF4.Dataset(path) as ds:
            name = variable or next(
                n for n, v in ds.variables.items() if v.ndim >= 2
            )
            return np.asarray(ds.variables[name][:])
    except ImportError:
        pass
    try:
        import xarray as xr  # type: ignore

        ds = xr.open_dataset(path)
        name = variable or next(iter(ds.data_vars))
        return ds[name].to_numpy()
    except ImportError:
        pass
    from scipy.io import netcdf_file

    with netcdf_file(path, "r", mmap=False) as ds:
        candidates = {
            n: v for n, v in ds.variables.items() if n not in ds.dimensions
        }
        name = variable or next(
            (n for n, v in candidates.items() if v.data.ndim >= 2),
            next(iter(candidates)),
        )
        return np.array(ds.variables[name].data)


class DeepEarth:
    """Register data sources, then predict fused embeddings anywhere/anytime."""

    def __init__(
        self,
        hidden_dim: int = 256,
        n_layers: int = 4,
        seed: int = 0,
    ):
        self._config = DeepEarthConfig(
            hidden_dim=hidden_dim,
            n_heads=max(4, hidden_dim // 64),
            n_layers=n_layers,
            grid4d=Grid4DConfig(
                n_spatial_levels=8, n_temporal_levels=4,
                hash_table_size=2 ** 15,
            ),
            modality_encoder=TransformerConfig(
                hidden_dim=hidden_dim // 2, n_heads=4, n_layers=2
            ),
        )
        self._seed = seed
        self._model: Optional[DeepEarthModel] = None
        self._params = None
        self._predict_fn = None
        self.sources: Dict[str, Dict[str, Any]] = {}

    # -- registration -------------------------------------------------------- #

    def register(
        self,
        name: str,
        shape: Optional[Sequence[int]] = None,
        type: str = "numerical",
        num_classes: Optional[int] = None,
        n_tokens: int = 1,
    ) -> "DeepEarth":
        """Register a data source (reference: deepearth_api.py:77-120)."""
        if self._model is not None:
            raise RuntimeError(
                "cannot register new sources after the model is built; "
                "create a new DeepEarth instance"
            )
        if type == "categorical":
            if num_classes is None:
                raise ValueError("categorical sources need num_classes")
            cfg = ModalityConfig(
                name=name, encoding_type="learned_embedding",
                input_type="categorical", vocab_size=num_classes,
            )
        else:
            if shape is None:
                raise ValueError("numerical sources need a shape")
            dim = int(np.prod(shape))
            cfg = ModalityConfig(
                name=name, input_dim=dim, n_tokens=n_tokens,
                encoder_layers=1, encoder_heads=4,
            )
        self._config.add_modality(cfg)
        self.sources[name] = {
            "shape": tuple(shape) if shape is not None else (),
            "type": type,
            "num_classes": num_classes,
        }
        return self

    # -- model lifecycle ------------------------------------------------------ #

    def _build(self, sample_batch: Dict[str, Any]) -> None:
        self._model = DeepEarthModel(self._config)
        self._params = self._model.init(
            jax.random.PRNGKey(self._seed), sample_batch
        )["params"]
        model = self._model

        @jax.jit
        def predict_fn(params, batch):
            out = model.apply({"params": params}, batch, deterministic=True)
            return out["fused_representation"], out["reconstructions"]

        self._predict_fn = predict_fn

    def _prepare_batch(
        self,
        locations: np.ndarray,
        times: Sequence,
        data: Dict[str, Any],
    ) -> Dict[str, Any]:
        b = locations.shape[0]
        lat = locations[:, 0]
        lon = locations[:, 1]
        alt = locations[:, 2] if locations.shape[1] > 2 else np.zeros(b)
        # naive global normalization (reference: deepearth_api.py:240-268)
        xyzt = np.stack(
            [
                (lat + 90.0) / 180.0,
                (lon + 180.0) / 360.0,
                np.clip(alt / 10_000.0, 0, 1),
                np.asarray([_parse_time(t) for t in times]),
            ],
            axis=-1,
        ).astype(np.float32)
        modalities = {}
        for name, spec in self.sources.items():
            if name not in data:
                continue
            arr = np.asarray(data[name])
            if spec["type"] == "categorical":
                modalities[name] = arr.reshape(b).astype(np.int32)
            else:
                modalities[name] = arr.reshape(
                    (b, -1)
                ).astype(np.float32)
        return {"xyzt": jnp.asarray(xyzt), "modalities": {
            k: jnp.asarray(v) for k, v in modalities.items()
        }}

    # -- prediction ----------------------------------------------------------- #

    def predict(
        self,
        location: Tuple[float, ...],
        time: Union[str, float, None] = None,
        data: Optional[Dict[str, Any]] = None,
    ) -> np.ndarray:
        """Single-point prediction → fused embedding (reference:
        deepearth_api.py:122-170)."""
        data = data or {}
        batched = {
            k: np.asarray(v)[None] if np.asarray(v).ndim <= 1 else np.asarray(v)
            for k, v in data.items()
        }
        emb, _ = self._predict_raw(
            np.asarray(location, np.float64)[None], [time], batched
        )
        return np.asarray(emb[0])

    def predict_batch(
        self,
        locations: Sequence[Tuple[float, ...]],
        times: Optional[Sequence] = None,
        data: Optional[Dict[str, Any]] = None,
        return_reconstructions: bool = False,
    ):
        locs = np.asarray(locations, np.float64)
        times = times if times is not None else [None] * len(locs)
        emb, recon = self._predict_raw(locs, times, data or {})
        if return_reconstructions:
            return np.asarray(emb), jax.tree_util.tree_map(np.asarray, recon)
        return np.asarray(emb)

    def _predict_raw(self, locs, times, data):
        batch = self._prepare_batch(locs, times, data)
        if self._model is None:
            self._build(batch)
        return self._predict_fn(self._params, batch)

    # -- persistence ----------------------------------------------------------- #

    def save(self, path: str) -> None:
        """Save params + source registry (reference: deepearth_api.py:296-308)."""
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "registry.json"), "w") as f:
            json.dump(self.sources, f)
        with open(os.path.join(path, "params.pkl"), "wb") as f:
            pickle.dump(
                jax.tree_util.tree_map(np.asarray, self._params), f
            )

    def load(self, path: str) -> "DeepEarth":
        with open(os.path.join(path, "registry.json")) as f:
            sources = json.load(f)
        for name, spec in sources.items():
            if name not in self.sources:
                self.register(
                    name,
                    shape=spec["shape"] or None,
                    type=spec["type"],
                    num_classes=spec["num_classes"],
                )
        with open(os.path.join(path, "params.pkl"), "rb") as f:
            params = pickle.load(f)
        # build model lazily on first predict; install params now
        self._params = jax.tree_util.tree_map(jnp.asarray, params)
        self._model = DeepEarthModel(self._config)
        model = self._model

        @jax.jit
        def predict_fn(p, batch):
            out = model.apply({"params": p}, batch, deterministic=True)
            return out["fused_representation"], out["reconstructions"]

        self._predict_fn = predict_fn
        return self


# -- functional API (reference: deepearth_api.py:320-328) --------------------- #

_GLOBAL: Optional[DeepEarth] = None


def init(**kwargs) -> DeepEarth:
    global _GLOBAL
    _GLOBAL = DeepEarth(**kwargs)
    return _GLOBAL


def register(name: str, **kwargs) -> DeepEarth:
    if _GLOBAL is None:
        init()
    return _GLOBAL.register(name, **kwargs)


def predict(location, time=None, data=None) -> np.ndarray:
    if _GLOBAL is None:
        raise RuntimeError("call init() and register() first")
    return _GLOBAL.predict(location, time, data)
