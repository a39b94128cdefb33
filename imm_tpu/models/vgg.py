"""VGG16 feature extractor for the perceptual reconstruction loss.

Reference behavior (tomasjakab/imm vendored VGG16, per SURVEY.md §2): a fixed
ImageNet-pretrained VGG16; the loss compares activations at conv1_2, conv2_2,
conv3_3, conv4_3 (+ a pixel term) between the target and the reconstruction.

Weight provenance on this machine (SURVEY.md §7 "hard parts"): **no pretrained
VGG16 weights exist on disk and there is no network**. The module therefore
supports three parameter sources, in order of fidelity:

1. ``load_vgg16_params(path)`` — a ``.npz`` or Keras ``.h5`` weight file, if
   one ever appears (searched every session).
2. Fixed *random* VGG features (``random_vgg16_params``): random convolutional
   features are a known-useful perceptual metric family; deterministic seed so
   the loss is stable across hosts/restores.
3. No VGG at all — the loss falls back to pixel + multi-scale terms
   (see ``imm_tpu.losses.perceptual``).

The extractor is truncated at conv4_3 by default (deeper blocks are unused by
the loss — no wasted MXU time).
"""

from __future__ import annotations

import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (block, conv-in-block) pairs; perceptual taps marked with their names.
_VGG_CFG: tuple[tuple[int, int], ...] = (
    (1, 64), (1, 64),
    (2, 128), (2, 128),
    (3, 256), (3, 256), (3, 256),
    (4, 512), (4, 512), (4, 512),
)
PERCEPTUAL_TAPS = ("conv1_2", "conv2_2", "conv3_3", "conv4_3")

# ImageNet RGB mean in [0, 255] (caffe-era preprocessing used by VGG16).
_IMAGENET_MEAN_RGB = np.array([123.68, 116.779, 103.939], np.float32)


def preprocess(images_01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB -> mean-subtracted [0,255] RGB (VGG16 input convention)."""
    return images_01 * 255.0 - jnp.asarray(_IMAGENET_MEAN_RGB)


class VGG16Features(nn.Module):
    """VGG16 conv trunk returning tapped activations.

    Returns a dict ``{tap_name: activation}`` for each name in ``taps``.
    Parameters are expected to be *frozen* (never passed to the optimizer).
    """

    taps: tuple[str, ...] = PERCEPTUAL_TAPS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images_01: jnp.ndarray) -> dict[str, jnp.ndarray]:
        x = preprocess(images_01).astype(self.dtype)
        outputs: dict[str, jnp.ndarray] = {}
        prev_block = 1
        idx_in_block = 0
        for block, width in _VGG_CFG:
            if block != prev_block:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                prev_block = block
                idx_in_block = 0
            idx_in_block += 1
            name = f"conv{block}_{idx_in_block}"
            x = nn.Conv(
                width,
                (3, 3),
                padding="SAME",
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=name,
            )(x)
            x = nn.relu(x)
            if name in self.taps:
                outputs[name] = x.astype(jnp.float32)
            if len(outputs) == len(self.taps):
                break
        return outputs


def random_vgg16_params(seed: int = 0) -> Any:
    """Deterministic random-feature VGG16 parameters (the offline fallback)."""
    model = VGG16Features()
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    init = jax.jit(lambda r: model.init(r, dummy)["params"])
    return init(jax.random.PRNGKey(seed))


def _params_from_arrays(get) -> Any:
    """Build the flax param tree from a ``name -> (kernel, bias)`` getter."""
    params: dict[str, Any] = {}
    prev_block = 1
    idx_in_block = 0
    for block, _ in _VGG_CFG:
        if block != prev_block:
            prev_block = block
            idx_in_block = 0
        idx_in_block += 1
        name = f"conv{block}_{idx_in_block}"
        kernel, bias = get(name)
        params[name] = {
            "kernel": jnp.asarray(kernel, jnp.float32),
            "bias": jnp.asarray(bias, jnp.float32),
        }
    return params


def load_vgg16_params(path: str) -> Any:
    """Load pretrained VGG16 conv weights from ``.npz`` or Keras ``.h5``.

    npz keys: ``conv{b}_{i}_kernel`` / ``conv{b}_{i}_bias`` (HWIO kernels) or
    Keras-style ``block{b}_conv{i}`` names. h5: the Keras applications layout.

    Channel convention: this module feeds **RGB** images (``preprocess``).
    Keras/caffe-lineage VGG16 was trained on BGR input, so BGR-lineage
    weights need conv1_1's input channels flipped at load time:
    conv(RGB − mean_RGB) is then bit-identical to the original
    conv(BGR − mean_BGR), since per-channel mean subtraction commutes with
    the channel permutation.

    Which files get the flip:

    - ``.h5`` (the Keras applications layout): always BGR lineage — flipped.
    - npz with ``conv{b}_{i}``-keys (this module's own export format):
      RGB-ready by contract — never flipped.
    - npz with Keras-style ``block{b}_conv{i}`` keys: **ambiguous** — the key
      style *suggests* an un-adapted Keras export (BGR), but a user may have
      pre-flipped per an earlier version of this docstring. An optional
      ``channel_order`` entry (scalar/0-d string ``'rgb'`` or ``'bgr'``)
      disambiguates explicitly; without it the loader assumes BGR (flips)
      and emits a ``UserWarning`` naming the assumption, so a double-flip is
      loud instead of silent.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if path.endswith(".npz"):
        data = np.load(path)
        order = None
        if "channel_order" in data:
            order = str(np.asarray(data["channel_order"]).item()).lower()
            if order not in ("rgb", "bgr"):
                raise ValueError(
                    f"channel_order must be 'rgb' or 'bgr', got {order!r}"
                )

        def get(name):
            b, i = int(name[4]), int(name[6])
            if f"{name}_kernel" in data:  # our RGB-ready export format
                return data[f"{name}_kernel"], data[f"{name}_bias"]
            kk, bk = f"block{b}_conv{i}_kernel", f"block{b}_conv{i}_bias"
            if kk in data:  # Keras-style keys
                kernel = data[kk]
                if name == "conv1_1" and order != "rgb":
                    if order is None:
                        import warnings

                        warnings.warn(
                            f"{path}: Keras-style npz keys without a "
                            "'channel_order' marker — assuming BGR lineage "
                            "and flipping conv1_1 input channels to RGB. If "
                            "these weights were already RGB-adapted, add "
                            "channel_order='rgb' to the npz.",
                            stacklevel=3,
                        )
                    kernel = kernel[:, :, ::-1, :]
                return kernel, data[bk]
            raise KeyError(f"no weights for {name} in {path}")

        return _params_from_arrays(get)
    if path.endswith((".h5", ".hdf5")):
        import h5py

        with h5py.File(path, "r") as f:

            def get(name):
                b, i = int(name[4]), int(name[6])
                layer = f"block{b}_conv{i}"
                grp = f[layer] if layer in f else f["model_weights"][layer]
                # Keras nests weights one level deeper under the layer name.
                if layer in grp:
                    grp = grp[layer]
                kernel = np.asarray(grp[[k for k in grp if "kernel" in k][0]])
                bias = np.asarray(grp[[k for k in grp if "bias" in k][0]])
                if name == "conv1_1":
                    # BGR-lineage -> RGB convention (see docstring)
                    kernel = kernel[:, :, ::-1, :]
                return kernel, bias

            return _params_from_arrays(get)
    raise ValueError(f"unsupported VGG16 weight format: {path}")


def save_vgg16_params(params: Any, path: str) -> None:
    """Export a VGG16Features param tree to this module's npz format.

    Written in the RGB-ready ``conv{b}_{i}_kernel/_bias`` convention with an
    explicit ``channel_order='rgb'`` marker, so :func:`load_vgg16_params`
    round-trips without any flip inference. Used by
    ``scripts/train_features.py`` to freeze the offline-trained feature
    extractor (SURVEY.md §7 step 3b).
    """
    flat: dict[str, np.ndarray] = {"channel_order": np.asarray("rgb")}
    for name, leaf in params.items():
        flat[f"{name}_kernel"] = np.asarray(leaf["kernel"], np.float32)
        flat[f"{name}_bias"] = np.asarray(leaf["bias"], np.float32)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def find_vgg16_weights() -> str | None:
    """Look for VGG16 weights in the usual offline locations."""
    candidates = [
        os.environ.get("IMM_TPU_VGG16_WEIGHTS", ""),
        os.path.expanduser("~/.keras/models/vgg16_weights_tf_dim_ordering_tf_kernels_notop.h5"),
        "/root/repo/weights/vgg16.npz",
        "/root/data/vgg16.npz",
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None
