from .augment import AugmentConfig, augment_pointcloud
from .semantic_kitti import SemanticKitti
from .perspective_pipeline import (
    PVConfig, build_batch, build_eval_sample_with_uproj, pad_points,
    pad_image, normalize_feature, project_to_canvas,
)
from .range_pipeline import (
    RangeConfig, build_range_batch, build_range_sample_with_uproj,
    range_project,
)
from .loader import (HostLoader, kitti_sample_reader,
    nuscenes_sample_reader, nuscenes_v2_sample_reader,
    sensat_sample_reader)
from .sensat_urban import (SensatUrban, SensatConfig, build_sensat_batch,
    compute_bev_feature, prepare_bev_frames, read_ply, write_ply,
    sensat_frame_weights)
from .nuscenes import Nuscenes, NuScenesLite, NuscenesV2

__all__ = [
    "AugmentConfig", "augment_pointcloud",
    "SemanticKitti",
    "PVConfig", "build_batch", "build_eval_sample_with_uproj",
    "pad_points", "pad_image", "normalize_feature", "project_to_canvas",
    "RangeConfig", "build_range_batch", "build_range_sample_with_uproj",
    "range_project",
    "HostLoader", "kitti_sample_reader", "nuscenes_sample_reader",
    "Nuscenes", "NuScenesLite", "NuscenesV2", "nuscenes_v2_sample_reader",
    "sensat_sample_reader", "SensatUrban", "SensatConfig",
    "build_sensat_batch", "compute_bev_feature", "prepare_bev_frames",
    "read_ply", "write_ply", "sensat_frame_weights",
]
