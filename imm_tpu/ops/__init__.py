"""Pure array ops: the numerical core of the framework.

Everything here is a pure function of arrays (jit/vmap/grad-safe, no state),
mirroring the behavior of the reference's TF graph ops while being designed for
XLA:TPU — static shapes, batched matmuls for the MXU, fusable elementwise tails.
"""

from imm_tpu.ops.coords import (
    marginal_softmax_coords,
    marginal_distributions,
)
from imm_tpu.ops.gauss import render_gaussian_maps
from imm_tpu.ops.image import (
    bilinear_sample,
    color_jitter,
    normalized_grid,
)
from imm_tpu.ops.tps import (
    TPSParams,
    tps_sampler_grid,
    sample_tps_params,
    warp_image,
)
from imm_tpu.ops.fused import landmark_bottleneck

__all__ = [
    "marginal_softmax_coords",
    "marginal_distributions",
    "render_gaussian_maps",
    "bilinear_sample",
    "color_jitter",
    "normalized_grid",
    "TPSParams",
    "tps_sampler_grid",
    "sample_tps_params",
    "warp_image",
    "landmark_bottleneck",
]
