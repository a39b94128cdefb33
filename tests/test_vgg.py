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


def _write_keras_style_npz(path, arrays, channel_order=None):
    flat = {}
    for name, (k, b) in arrays.items():
        blk, idx = int(name[4]), int(name[6])
        flat[f"block{blk}_conv{idx}_kernel"] = k
        flat[f"block{blk}_conv{idx}_bias"] = b
    if channel_order is not None:
        flat["channel_order"] = np.asarray(channel_order)
    np.savez(path, **flat)


def test_npz_keras_keys_flip_conv1_1(tmp_path):
    """Keras-style npz keys *suggest* caffe/BGR lineage -> conv1_1 flipped
    like the .h5 path, but with a UserWarning because the inference is
    ambiguous (ADVICE r2 medium); our own conv{b}_{i} keys load untouched."""
    arrays = _tiny_weight_arrays()
    path = str(tmp_path / "keras_style.npz")
    _write_keras_style_npz(path, arrays)
    with pytest.warns(UserWarning, match="assuming BGR"):
        params = load_vgg16_params(path)
    np.testing.assert_array_equal(
        np.asarray(params["conv1_1"]["kernel"]),
        arrays["conv1_1"][0][:, :, ::-1, :],
    )
    np.testing.assert_array_equal(
        np.asarray(params["conv1_2"]["kernel"]), arrays["conv1_2"][0]
    )


def test_save_load_roundtrip_and_trained_source(tmp_path, recwarn):
    """save_vgg16_params -> load_vgg16_params round-trips bitwise with no
    warning, and feature_source='trained' wires the weights into the
    perceptual loss (SURVEY §7 step 3b)."""
    import jax.numpy as jnp

    from imm_tpu.losses.perceptual import (
        PerceptualLossConfig,
        ReconstructionLoss,
    )
    from imm_tpu.models.vgg import save_vgg16_params

    params = random_vgg16_params(7)
    path = str(tmp_path / "weights" / "trained_features.npz")
    save_vgg16_params(params, path)
    loaded = load_vgg16_params(path)
    for name in ("conv1_1", "conv2_2", "conv4_3"):
        np.testing.assert_array_equal(
            np.asarray(params[name]["kernel"]),
            np.asarray(loaded[name]["kernel"]),
        )
    assert not [w for w in recwarn if issubclass(w.category, UserWarning)]

    cfg = PerceptualLossConfig(feature_source="trained", trained_weights=path)
    loss = ReconstructionLoss(cfg)
    assert loss.source == "trained"
    np.testing.assert_array_equal(
        np.asarray(loss.vgg_params["conv1_1"]["kernel"]),
        np.asarray(params["conv1_1"]["kernel"]),
    )
    a = jnp.zeros((2, 32, 32, 3)) + 0.3
    b = jnp.zeros((2, 32, 32, 3)) + 0.6
    total, _, _ = loss(a, b, loss.init_ema(), step=0)
    assert np.isfinite(float(total)) and float(total) > 0

    missing = PerceptualLossConfig(
        feature_source="trained", trained_weights=str(tmp_path / "nope.npz")
    )
    with pytest.raises(FileNotFoundError, match="train_features"):
        ReconstructionLoss(missing)


def test_npz_channel_order_marker_disambiguates(tmp_path, recwarn):
    """An explicit channel_order entry overrides the key-style inference:
    'rgb' blocks the flip (pre-adapted exports stay correct), 'bgr' flips
    silently — neither path warns."""
    arrays = _tiny_weight_arrays()

    p_rgb = str(tmp_path / "rgb.npz")
    _write_keras_style_npz(p_rgb, arrays, channel_order="rgb")
    params = load_vgg16_params(p_rgb)
    np.testing.assert_array_equal(
        np.asarray(params["conv1_1"]["kernel"]), arrays["conv1_1"][0]
    )

    p_bgr = str(tmp_path / "bgr.npz")
    _write_keras_style_npz(p_bgr, arrays, channel_order="bgr")
    params = load_vgg16_params(p_bgr)
    np.testing.assert_array_equal(
        np.asarray(params["conv1_1"]["kernel"]),
        arrays["conv1_1"][0][:, :, ::-1, :],
    )
    assert not [w for w in recwarn if issubclass(w.category, UserWarning)]

    p_bad = str(tmp_path / "bad.npz")
    _write_keras_style_npz(p_bad, arrays, channel_order="grb")
    with pytest.raises(ValueError, match="channel_order"):
        load_vgg16_params(p_bad)
