from .kitti_eval import get_official_eval_result, evaluate_from_files
from .rotate_iou import rotate_iou_eval

__all__ = ["get_official_eval_result", "evaluate_from_files", "rotate_iou_eval"]
