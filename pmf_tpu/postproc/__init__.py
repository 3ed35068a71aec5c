"""KNN 2D→3D post-processing (pc_processor.postproc parity re-export)."""
from ..ops.knn import knn_postprocess, gaussian_kernel2d

KNN = knn_postprocess

__all__ = ["knn_postprocess", "gaussian_kernel2d", "KNN"]
