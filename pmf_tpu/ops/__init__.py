from .projection import (
    perspective_project,
    yaw_crop_project,
    spherical_project,
    read_kitti_calib,
)
from .scatter import zbuffer_scatter, scatter_to_image
from .knn import knn_postprocess, gaussian_kernel2d
from .resize import upsample_bilinear, pixel_shuffle

__all__ = [
    "perspective_project",
    "yaw_crop_project",
    "spherical_project",
    "read_kitti_calib",
    "zbuffer_scatter",
    "scatter_to_image",
    "knn_postprocess",
    "gaussian_kernel2d",
    "upsample_bilinear",
    "pixel_shuffle",
]
