"""Golden tests against the reference implementation (SURVEY.md §4).

The reference mount ``/root/reference`` (tomasjakab/imm, TF1) was EMPTY at
build time, so these tests skip unless it materializes. When it does: the
same fixed inputs must flow through both the TF1 graph ops and the JAX ops,
with landmark outputs comparable at fp32 tolerance (BASELINE.json asks for
"bitwise-comparable landmark outputs"; resize/padding-semantics deltas, if
any, must be documented here).
"""

import os

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"

reference_available = os.path.isdir(REFERENCE_ROOT) and len(
    os.listdir(REFERENCE_ROOT)
) > 0

pytestmark = pytest.mark.skipif(
    not reference_available,
    reason="reference mount is empty (verified empty 2026-08-16; see SURVEY.md)",
)


def test_spatial_softmax_matches_reference():
    """Fixed heatmaps through reference get_coord vs marginal_softmax_coords."""
    import sys

    sys.path.insert(0, REFERENCE_ROOT)
    # Import the reference model ops (TF1) and compare on fixed inputs.
    import tensorflow as tf  # noqa: F401

    from imm_tpu.ops import marginal_softmax_coords  # noqa: F401

    rng = np.random.default_rng(0)
    heatmaps = rng.normal(size=(2, 16, 16, 5)).astype(np.float32)  # noqa: F841
    # Reference call-site to be wired once the tree layout is known:
    #   from imm.models.imm_model import get_coord
    # and compared against marginal_softmax_coords(heatmaps) at atol=1e-5.
    pytest.fail(
        "reference mount appeared — wire this golden test to the real "
        "imm/models/imm_model.py ops before trusting parity claims"
    )
