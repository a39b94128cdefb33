from imm_tpu.losses.perceptual import (
    PerceptualLossConfig,
    ReconstructionLoss,
)

__all__ = ["PerceptualLossConfig", "ReconstructionLoss"]
