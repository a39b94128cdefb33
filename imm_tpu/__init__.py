"""imm_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for unsupervised
object-landmark discovery through conditional image generation.

Re-designed from scratch with the capabilities of the reference ``tomasjakab/imm``
(Jakab, Gupta, Bilen, Vedaldi — NeurIPS 2018). The reference is a single-machine
TF1 research codebase; this package is a ground-up TPU-first redesign:

- all deformation-pair synthesis (TPS + similarity warps, color jitter) runs
  *on device inside the jitted train step* as batched matmuls + gathers rather
  than per-element host ops (reference: ``imm/datasets/tps_sampler.py``);
- the landmark bottleneck (marginal spatial softmax -> expected coords ->
  Gaussian re-render, reference: ``imm/models/imm_model.py:get_coord`` /
  ``get_gaussian_maps``) is available both as fusable jnp ops and as a fused
  Pallas TPU kernel;
- data parallelism is a ``jax.sharding.Mesh`` + ``pjit`` program with gradient
  all-reduce over ICI (reference: in-graph multi-GPU towers).

Layout:
    ops/       pure array ops: coords, gaussian rendering, TPS, image ops, pallas
    models/    flax modules: encoders, decoder, IMM, VGG16 features
    losses/    perceptual reconstruction loss
    data/      synthetic harness + CelebA/MAFL, AFLW, cat-heads, Human3.6M loaders
    parallel/  mesh construction and sharding helpers
    train/     train state, jitted steps, trainer loop, checkpointing
    eval/      landmark-regression evaluation protocol, pose-swap inference
    utils/     config system, visualization
    configs/   the five experiment presets
"""

__version__ = "0.1.0"
