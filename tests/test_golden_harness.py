"""Self-test for the golden-reference harness (VERDICT r4 next #6).

``tests/test_golden_reference.py`` must execute REAL numeric comparisons,
with zero human edits, the day ``/root/reference`` materializes. Nothing on
this machine can prove that against the actual reference (the mount has
been empty every session), so this file proves the next-best property: the
harness end-to-end — mount detection, layout search, the TF1-under-TF2
module shim, signature adaptation, graph execution, and the numeric
comparisons — runs green against a SYNTHETIC TF1 tree whose ops implement
the SURVEY §2 documented semantics (marginal-softmax expectation on a
[-1,1] ruler; rot/flat/ankush Gaussian rendering).

The synthetic tree is a test fixture for the harness, NOT reference code:
it is written from SURVEY.md's behavioral spec (the same spec the JAX ops
were built from) and exists so a wiring bug in the golden tests surfaces
today instead of on mount-day.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import textwrap

import pytest

_GOLDEN_PATH = os.path.join(os.path.dirname(__file__),
                            "test_golden_reference.py")

# TF1-style module implementing SURVEY §2's documented op semantics. Uses
# v1-only API (tf.to_float, tf.lin_space) on purpose: it verifies the
# sys.modules['tensorflow'] -> tf.compat.v1 shim actually engages.
_IMM_MODEL_TF1 = textwrap.dedent(
    """
    import tensorflow as tf

    def get_coord(x, other_axis, axis_size):
        g_c_prob = tf.reduce_mean(x, axis=other_axis)   # (B, axis, K)
        g_c_prob = tf.nn.softmax(g_c_prob, axis=1)
        coord_pt = tf.to_float(tf.lin_space(-1.0, 1.0, axis_size))
        coord_pt = tf.reshape(coord_pt, [1, axis_size, 1])
        g_c = tf.reduce_sum(g_c_prob * coord_pt, axis=1)  # (B, K)
        return g_c, g_c_prob

    def get_gaussian_maps(mu, shape_hw, inv_std, mode='rot'):
        mu_y, mu_x = mu[:, :, 0:1], mu[:, :, 1:2]       # (B, K, 1)
        y = tf.to_float(tf.lin_space(-1.0, 1.0, shape_hw[0]))
        x = tf.to_float(tf.lin_space(-1.0, 1.0, shape_hw[1]))
        if mode in ('rot', 'flat'):
            mu_y, mu_x = tf.expand_dims(mu_y, -1), tf.expand_dims(mu_x, -1)
            y = tf.reshape(y, [1, 1, shape_hw[0], 1])
            x = tf.reshape(x, [1, 1, 1, shape_hw[1]])
            g_y = tf.square(y - mu_y)                   # (B, K, H, 1)
            g_x = tf.square(x - mu_x)                   # (B, K, 1, W)
            dist = (g_y + g_x) * inv_std ** 2
            if mode == 'rot':
                g_yx = tf.exp(-dist)
            else:
                g_yx = tf.exp(-tf.pow(dist + 1e-5, 0.25))
        elif mode == 'ankush':
            y = tf.reshape(y, [1, 1, shape_hw[0]])
            x = tf.reshape(x, [1, 1, shape_hw[1]])
            g_y = tf.exp(-tf.sqrt(1e-4 + tf.abs((mu_y - y) * inv_std)))
            g_x = tf.exp(-tf.sqrt(1e-4 + tf.abs((mu_x - x) * inv_std)))
            g_y = tf.expand_dims(g_y, axis=3)           # (B, K, H, 1)
            g_x = tf.expand_dims(g_x, axis=2)           # (B, K, 1, W)
            g_yx = tf.matmul(g_y, g_x)                  # (B, K, H, W)
        else:
            raise ValueError('Unknown mode: ' + str(mode))
        return tf.transpose(g_yx, perm=[0, 2, 3, 1])    # NHWC
    """
)

_TPS_SAMPLER_TF1 = textwrap.dedent(
    """
    import tensorflow as tf

    class TPSRandomSampler(object):
        def __init__(self, height, width, rotsd=0.0, scalesd=0.0,
                     transsd=0.1, warpsd=0.01, pad=True):
            self._hw = (height, width)
            self._zero_noise = (
                rotsd == 0.0 and scalesd == 0.0 and transsd == 0.0
                and warpsd == 0.0
            )
            self._pad = pad

        def forward(self, images):
            # Harness fixture: only the zero-noise identity law is exercised
            # cross-framework (RNGs cannot be shared), so the non-zero path
            # is deliberately unimplemented.
            if not self._zero_noise:
                raise NotImplementedError('fixture supports zero noise only')
            return tf.identity(images)
    """
)


def _load_golden(ref_root: str):
    """Import the golden test module with its mount pointed at ``ref_root``
    (fresh module instance so the real file's globals stay untouched)."""
    spec = importlib.util.spec_from_file_location(
        "golden_under_test", _GOLDEN_PATH
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.REFERENCE_ROOT = ref_root
    mod.reference_available = True
    return mod


@pytest.fixture()
def synthetic_reference(tmp_path):
    pytest.importorskip("tensorflow")
    root = tmp_path / "reference"
    # SURVEY §2 layout includes a top-level package dir: <root>/imm/...
    (root / "imm" / "models").mkdir(parents=True)
    (root / "imm" / "datasets").mkdir(parents=True)
    (root / "imm" / "models" / "imm_model.py").write_text(_IMM_MODEL_TF1)
    (root / "imm" / "datasets" / "tps_sampler.py").write_text(
        _TPS_SAMPLER_TF1
    )
    return str(root)


def test_harness_runs_spatial_softmax_comparison(synthetic_reference):
    g = _load_golden(synthetic_reference)
    g.test_spatial_softmax_matches_reference()


@pytest.mark.parametrize("mode", ["rot", "flat", "ankush"])
def test_harness_runs_gaussian_maps_comparison(synthetic_reference, mode):
    g = _load_golden(synthetic_reference)
    g.test_gaussian_maps_match_reference(mode)


def test_harness_runs_tps_identity_comparison(synthetic_reference):
    g = _load_golden(synthetic_reference)
    g.test_tps_sampler_identity_matches_reference()


def test_harness_fails_actionably_on_unknown_layout(tmp_path):
    pytest.importorskip("tensorflow")
    root = tmp_path / "reference"
    (root / "unexpected").mkdir(parents=True)
    (root / "unexpected" / "stuff.py").write_text("x = 1\n")
    g = _load_golden(str(root))
    with pytest.raises(pytest.fail.Exception, match="could not locate"):
        g.test_spatial_softmax_matches_reference()
