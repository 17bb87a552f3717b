"""Core tensor ops: decode, gathers, gaussian targets, FFT domain mixing."""

from centernet_uda_tpu.ops.tensor import (
    sigmoid_clamped,
    gather_features,
    gather_features_nhwc,
)
from centernet_uda_tpu.ops.decode import decode_detections, nms_peaks, top_k_peaks
from centernet_uda_tpu.ops.gaussian import (
    gaussian_radius,
    gaussian_2d,
    draw_gaussian,
    splat_gaussians,
)
from centernet_uda_tpu.ops.entropy import entropy_map
from centernet_uda_tpu.ops.fda import fda_source_to_target

__all__ = [
    "sigmoid_clamped",
    "gather_features",
    "gather_features_nhwc",
    "decode_detections",
    "nms_peaks",
    "top_k_peaks",
    "gaussian_radius",
    "gaussian_2d",
    "draw_gaussian",
    "splat_gaussians",
    "entropy_map",
    "fda_source_to_target",
]
