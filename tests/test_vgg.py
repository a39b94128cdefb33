"""VGG16 weight loading + channel-convention tests (ADVICE r1 medium).

The reference's perceptual loss uses caffe-lineage VGG16 (BGR input). Our
module feeds RGB, so Keras .h5 loads must flip conv1_1's input channels —
otherwise real weights would silently compute channel-permuted features.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imm_tpu.models.vgg import (
    VGG16Features,
    _IMAGENET_MEAN_RGB,
    load_vgg16_params,
    random_vgg16_params,
)

_VGG_LAYERS = [
    ("conv1_1", 64), ("conv1_2", 64),
    ("conv2_1", 128), ("conv2_2", 128),
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256),
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512),
]


def _tiny_weight_arrays(seed=0):
    """Random HWIO kernels + biases in the true VGG16 shapes."""
    rng = np.random.default_rng(seed)
    arrays = {}
    c_in = 3
    for name, width in _VGG_LAYERS:
        arrays[name] = (
            rng.normal(size=(3, 3, c_in, width)).astype(np.float32) * 0.05,
            rng.normal(size=(width,)).astype(np.float32) * 0.01,
        )
        c_in = width
    return arrays


def _write_npz(path, arrays):
    flat = {}
    for name, (k, b) in arrays.items():
        flat[f"{name}_kernel"] = k
        flat[f"{name}_bias"] = b
    np.savez(path, **flat)


def _write_keras_h5(path, arrays):
    h5py = pytest.importorskip("h5py")
    with h5py.File(path, "w") as f:
        for name, (k, b) in arrays.items():
            blk, idx = int(name[4]), int(name[6])
            layer = f"block{blk}_conv{idx}"
            grp = f.create_group(layer).create_group(layer)
            grp.create_dataset("kernel:0", data=k)
            grp.create_dataset("bias:0", data=b)


def test_npz_load_roundtrip(tmp_path):
    arrays = _tiny_weight_arrays()
    p = str(tmp_path / "vgg16.npz")
    _write_npz(p, arrays)
    params = load_vgg16_params(p)
    np.testing.assert_array_equal(
        np.asarray(params["conv1_1"]["kernel"]), arrays["conv1_1"][0]
    )
    np.testing.assert_array_equal(
        np.asarray(params["conv4_3"]["bias"]), arrays["conv4_3"][1]
    )


def test_h5_load_flips_conv1_1_only(tmp_path):
    arrays = _tiny_weight_arrays()
    p = str(tmp_path / "vgg16.h5")
    _write_keras_h5(p, arrays)
    params = load_vgg16_params(p)
    np.testing.assert_array_equal(
        np.asarray(params["conv1_1"]["kernel"]),
        arrays["conv1_1"][0][:, :, ::-1, :],
    )
    np.testing.assert_array_equal(
        np.asarray(params["conv1_2"]["kernel"]), arrays["conv1_2"][0]
    )


def test_rgb_path_matches_caffe_bgr_computation(tmp_path):
    """Module(RGB) with flipped conv1_1 == caffe pipeline conv(BGR - meanBGR):
    the equivalence the flip exists to guarantee, checked numerically."""
    arrays = _tiny_weight_arrays()
    p = str(tmp_path / "vgg16.h5")
    _write_keras_h5(p, arrays)
    params = load_vgg16_params(p)

    model = VGG16Features(taps=("conv1_1",), dtype=jnp.float32)
    rgb = jnp.asarray(
        np.random.default_rng(3).uniform(size=(2, 16, 16, 3)).astype(np.float32)
    )
    ours = model.apply({"params": params}, rgb)["conv1_1"]

    # the original network's conv1_1 on caffe-preprocessed BGR input
    bgr255 = rgb[..., ::-1] * 255.0 - jnp.asarray(_IMAGENET_MEAN_RGB[::-1].copy())
    k, b = arrays["conv1_1"]
    raw = jax.lax.conv_general_dilated(
        bgr255, jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(b)
    theirs = jax.nn.relu(raw)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), atol=2e-3)


def test_find_weights_env_override(tmp_path, monkeypatch):
    from imm_tpu.models.vgg import find_vgg16_weights

    p = tmp_path / "w.npz"
    _write_npz(str(p), _tiny_weight_arrays())
    monkeypatch.setenv("IMM_TPU_VGG16_WEIGHTS", str(p))
    assert find_vgg16_weights() == str(p)


def test_random_params_deterministic():
    a = random_vgg16_params(0)
    b = random_vgg16_params(0)
    np.testing.assert_array_equal(
        np.asarray(a["conv1_1"]["kernel"]), np.asarray(b["conv1_1"]["kernel"])
    )


def test_npz_keras_keys_flip_conv1_1(tmp_path):
    """Keras-style npz keys signal caffe/BGR lineage -> conv1_1 flipped,
    exactly like the .h5 path; our own conv{b}_{i} keys load untouched."""
    arrays = _tiny_weight_arrays()
    path = str(tmp_path / "keras_style.npz")
    flat = {}
    for name, (k, b) in arrays.items():
        blk, idx = int(name[4]), int(name[6])
        flat[f"block{blk}_conv{idx}_kernel"] = k
        flat[f"block{blk}_conv{idx}_bias"] = b
    np.savez(path, **flat)
    params = load_vgg16_params(path)
    np.testing.assert_array_equal(
        np.asarray(params["conv1_1"]["kernel"]),
        arrays["conv1_1"][0][:, :, ::-1, :],
    )
    np.testing.assert_array_equal(
        np.asarray(params["conv1_2"]["kernel"]), arrays["conv1_2"][0]
    )
