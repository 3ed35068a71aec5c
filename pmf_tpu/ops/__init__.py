from .projection import (
    perspective_project,
    perspective_project_cam,
    yaw_crop_project,
    spherical_project,
    read_kitti_calib,
)
from .scatter import (zbuffer_scatter, zbuffer_scatter_packed,
    scatter_to_image, fill_canvas)
from .knn import knn_postprocess, gaussian_kernel2d
from .reduce import argmax_last
from .resize import upsample_bilinear, pixel_shuffle

__all__ = [
    "perspective_project",
    "perspective_project_cam",
    "yaw_crop_project",
    "spherical_project",
    "read_kitti_calib",
    "zbuffer_scatter",
    "zbuffer_scatter_packed",
    "scatter_to_image",
    "fill_canvas",
    "knn_postprocess",
    "gaussian_kernel2d",
    "argmax_last",
    "upsample_bilinear",
    "pixel_shuffle",
]
