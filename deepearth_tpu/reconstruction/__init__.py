"""Reconstruction side-pipeline (L7): posed imagery, point clouds.

Gaussian splatting (reference: reconstruction/gaussian_splat.py, gsplat CUDA)
has no TPU-native rasterizer; the dataset/point-cloud layers here feed either
a host-side renderer or export to standard tools. See docs for scope notes.
"""

from .geofusion_dataset import CameraIntrinsics, Frame, GeoFusionDataset
from .point_cloud import (
    depth_to_world_cloud,
    load_ply,
    save_ply,
    transform_points,
    unproject_depth,
    voxel_downsample,
)

__all__ = [
    "CameraIntrinsics",
    "Frame",
    "GeoFusionDataset",
    "depth_to_world_cloud",
    "load_ply",
    "save_ply",
    "transform_points",
    "unproject_depth",
    "voxel_downsample",
]
