"""Perceptual (feature) reconstruction loss.

Reference behavior (tomasjakab/imm — mount empty at build time, per SURVEY.md
§0 step 5 and §2): L2 between VGG16 activations of the target and the
reconstruction at conv1_2, conv2_2, conv3_3, conv4_3, plus a pixel term; each
term carries a weight balancing its scale. The VGG is fixed (never trained).

Because no pretrained VGG16 weights exist on this machine (SURVEY.md §7), the
loss is *pluggable*:

- ``feature_source='vgg'``: pretrained weights from disk if found;
- ``feature_source='random_vgg'``: fixed random VGG features (deterministic
  seed) — a usable perceptual metric offline, and the default fallback;
- ``feature_source='trained'``: the same VGG16 trunk with weights trained
  offline by ``scripts/train_features.py`` (denoising objective on synthetic
  frames — SURVEY.md §7 step 3b, the closest-to-real perceptual metric
  buildable with no network);
- ``feature_source='pixel'``: no feature network; pixel + multi-scale L2.

Term balancing: raw per-layer L2s differ by orders of magnitude. The loss
keeps an EMA of each raw term and normalizes terms by it (stop-gradient), so
every tap contributes O(1) — a state-space version of the reference's
hand-tuned per-layer weights that needs no tuning when the feature source
changes. The EMA vector lives in the train state and is psum-free (identical
on every data-parallel replica since it updates from the *global* mean loss).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from imm_tpu.models.vgg import (
    PERCEPTUAL_TAPS,
    VGG16Features,
    find_vgg16_weights,
    load_vgg16_params,
    random_vgg16_params,
)


@dataclasses.dataclass(frozen=True, unsafe_hash=True)
class PerceptualLossConfig:
    # 'vgg' | 'random_vgg' | 'trained' | 'pixel' | 'auto'
    feature_source: str = "auto"
    # Weight file for feature_source='trained' (scripts/train_features.py
    # writes it; relative paths resolve against the CWD).
    trained_weights: str = "weights/trained_features.npz"
    taps: tuple[str, ...] = PERCEPTUAL_TAPS
    # bfloat16 feature extraction: the VGG is a *metric*, not the model —
    # bf16 keeps its convs on the MXU fast path and halves its HBM traffic.
    compute_dtype: str = "bfloat16"
    # Static weights applied after EMA normalization (pixel term first).
    weights: tuple[float, ...] = (1.0, 1.0, 1.0, 1.0, 1.0)
    ema_decay: float = 0.99
    pixel_scales: int = 3  # multi-scale pyramid depth for the 'pixel' source
    vgg_seed: int = 0
    # Downsample factor (avg-pool) applied to recon+target before the VGG
    # pass. 2 quarters the VGG FLOPs (the step's dominant cost — see
    # PERFORMANCE.md) while the taps keep their receptive-field structure;
    # the full-resolution pixel term is computed before pooling, so no
    # fine-detail signal is lost entirely. 1 = reference-faithful.
    input_scale: int = 1

    def resolve_source(self) -> tuple[str, str | None]:
        """-> (source, weights_path). 'auto' prefers real VGG, else random."""
        if self.feature_source == "auto":
            path = find_vgg16_weights()
            return ("vgg", path) if path else ("random_vgg", None)
        if self.feature_source == "vgg":
            path = find_vgg16_weights()
            if path is None:
                raise FileNotFoundError(
                    "feature_source='vgg' but no VGG16 weights found on disk; "
                    "set IMM_TPU_VGG16_WEIGHTS or use 'random_vgg'/'pixel'"
                )
            return "vgg", path
        if self.feature_source == "trained":
            import os

            if not os.path.exists(self.trained_weights):
                raise FileNotFoundError(
                    f"feature_source='trained' but {self.trained_weights!r} "
                    "does not exist — train one with "
                    "scripts/train_features.py first"
                )
            return "trained", self.trained_weights
        return self.feature_source, None


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) * 0.25


class ReconstructionLoss:
    """Callable loss with frozen feature parameters resolved at construction."""

    def __init__(self, config: PerceptualLossConfig = PerceptualLossConfig()):
        self.config = config
        source, path = config.resolve_source()
        self.source = source
        if source in ("vgg", "trained", "random_vgg"):
            self._vgg = VGG16Features(
                taps=config.taps, dtype=jnp.dtype(config.compute_dtype)
            )
            if source in ("vgg", "trained"):
                self.vgg_params = load_vgg16_params(path)
            else:
                self.vgg_params = random_vgg16_params(config.vgg_seed)
            self.n_terms = 1 + len(config.taps)
        elif source == "pixel":
            self._vgg = None
            self.vgg_params = None
            self.n_terms = config.pixel_scales
        else:
            raise ValueError(f"unknown feature source: {source!r}")
        if len(config.weights) < self.n_terms:
            raise ValueError(
                f"need {self.n_terms} loss weights, got {len(config.weights)}"
            )
        if config.input_scale & (config.input_scale - 1) or config.input_scale < 1:
            raise ValueError(
                f"input_scale must be a power of two, got {config.input_scale}"
            )
        if config.input_scale != 1 and source == "pixel":
            raise ValueError(
                "input_scale applies to the VGG feature pass; the 'pixel' "
                "source has no VGG — its own pyramid is pixel_scales"
            )

    def init_ema(self) -> jnp.ndarray:
        return jnp.ones((self.n_terms,), jnp.float32)

    def _raw_terms(self, recon, target) -> list[jnp.ndarray]:
        if self.source == "pixel":
            terms = []
            r, t = recon, target
            for _ in range(self.config.pixel_scales):
                terms.append(jnp.mean(jnp.square(r - t)))
                r, t = _avg_pool2(r), _avg_pool2(t)
            return terms
        # One VGG pass over the stacked batch instead of two: doubles the
        # conv batch (better MXU utilization) and halves kernel dispatches.
        both = jnp.concatenate([recon, target], axis=0)
        for _ in range(self.config.input_scale.bit_length() - 1):
            both = _avg_pool2(both)
        feats = self._vgg.apply({"params": self.vgg_params}, both)
        b = recon.shape[0]
        terms = [jnp.mean(jnp.square(recon - target))]
        for tap in self.config.taps:
            f = feats[tap]
            terms.append(jnp.mean(jnp.square(f[:b] - f[b:])))
        return terms

    def __call__(
        self,
        recon: jnp.ndarray,
        target: jnp.ndarray,
        ema: jnp.ndarray,
        step: jnp.ndarray | int = 1,
        axis_name: str | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray, dict[str, jnp.ndarray]]:
        """-> (total_loss, new_ema, per-term metrics).

        ``step`` lets the first optimization step seed the EMA from the live
        terms instead of the ones-init, so early gradient scales are sane.
        ``axis_name``: under shard_map, pmean the raw terms across the data
        axis so the loss (and the EMA it feeds) is the *global* batch mean —
        gradients of this pmean'd objective are already the per-shard
        contributions to the global gradient.
        """
        terms = self._raw_terms(recon, target)
        raw = jnp.stack(terms)
        if axis_name is not None:
            raw = jax.lax.pmean(raw, axis_name)
        ema = jnp.where(step == 0, jax.lax.stop_gradient(raw), ema)
        norm = jax.lax.stop_gradient(ema) + 1e-8
        weights = jnp.asarray(self.config.weights[: self.n_terms], jnp.float32)
        total = jnp.sum(weights * raw / norm) / jnp.sum(weights)
        d = self.config.ema_decay
        new_ema = d * ema + (1.0 - d) * jax.lax.stop_gradient(raw)
        names = (
            ["pixel"] + list(self.config.taps)
            if self.source != "pixel"
            else [f"pixel_s{i}" for i in range(self.n_terms)]
        )
        # report from `raw` (pmean'd under shard_map) so logged per-term
        # losses are global-batch values, consistent with loss/total
        metrics = {f"loss/{n}": raw[i] for i, n in enumerate(names)}
        return total, new_ema, metrics
