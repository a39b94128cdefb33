from imm_tpu.eval.regression import (
    fit_landmark_regressor,
    predict_landmarks,
    landmark_error,
    evaluate_landmarks,
)
from imm_tpu.eval.swap import pose_swap

__all__ = [
    "fit_landmark_regressor",
    "predict_landmarks",
    "landmark_error",
    "evaluate_landmarks",
    "pose_swap",
]
