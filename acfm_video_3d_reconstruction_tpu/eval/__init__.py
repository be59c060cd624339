from . import metrics, predictor  # noqa: F401
from .metrics import BenchStats, kp_errors, kp_errors_pixel, mask_iou  # noqa: F401
