"""Golden tests against the reference implementation (SURVEY.md §4).

The reference mount ``/root/reference`` (tomasjakab/imm, TF1) has been EMPTY
every session so far (re-verified each session; see SURVEY.md "Mandatory
re-verification protocol"), so these tests skip while it stays empty. The
moment it materializes they run COMPLETE numeric comparisons with zero
human wiring (VERDICT r4 next #6):

* ``get_coord``            vs ``imm_tpu.ops.marginal_softmax_coords``
* ``get_gaussian_maps``    vs ``imm_tpu.ops.render_gaussian_maps`` (all 3 modes)
* ``TPSRandomSampler``     vs ``imm_tpu.ops.tps`` (zero-noise identity law)

Expected reference layout (SURVEY.md §2 component table, `[PUB-REPO]` rows):
``<root>/models/imm_model.py`` with ``get_coord(x, other_axis, axis_size)``
and ``get_gaussian_maps(mu, shape_hw, inv_std, mode)``;
``<root>/datasets/tps_sampler.py`` with ``TPSRandomSampler``. The loaders
below tolerate an extra top-level package directory and minor signature
drift, and FAIL with an actionable message (found tree, attempted call
forms, numeric diffs) on anything else — parity evidence is produced, not
demanded, on the day the mount fills.

BASELINE.json asks for "bitwise-comparable landmark outputs"; per SURVEY §7
risk 3 we compare at fp32 tolerance (atol=1e-5) and any resize/padding
-semantics delta found must be documented here.
"""

from __future__ import annotations

import contextlib
import glob
import importlib.util
import inspect
import os
import sys

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"

reference_available = os.path.isdir(REFERENCE_ROOT) and len(
    os.listdir(REFERENCE_ROOT)
) > 0

pytestmark = pytest.mark.skipif(
    not reference_available,
    reason="reference mount is empty (re-verified every session; SURVEY.md)",
)

ATOL = 1e-5


# ---------------------------------------------------------------------------
# Reference loading. TF1 code under a TF2 install runs through the compat.v1
# shim: we alias sys.modules['tensorflow'] to tf.compat.v1 (graph mode)
# while executing reference modules, then restore.
# ---------------------------------------------------------------------------


def _tf1():
    try:
        import tensorflow as tf
    except ImportError:
        pytest.fail(
            "reference mount materialized but tensorflow is not importable "
            "— the golden comparisons need TF to execute the TF1 reference "
            "ops; install it (or point PYTHONPATH at one) and re-run"
        )
    tf1 = getattr(getattr(tf, "compat", tf), "v1", tf)
    # Deliberately NOT calling tf1.disable_eager_execution(): it is
    # process-global and breaks eager tf.data pipelines in later tests
    # (test_data/test_trainer tfdata paths). _run_graph builds every
    # reference op inside an explicit tf1.Graph()+Session, which executes
    # v1 graph code correctly under an eager-enabled TF2 runtime.
    return tf1


def _tree_summary(root: str, depth: int = 2) -> str:
    lines = []
    for cur, dirs, files in os.walk(root):
        rel = os.path.relpath(cur, root)
        level = 0 if rel == "." else rel.count(os.sep) + 1
        if level > depth:
            dirs[:] = []
            continue
        lines.append(f"{'  ' * level}{os.path.basename(cur)}/")
        if level == depth:
            lines.extend(f"{'  ' * (level + 1)}{f}" for f in sorted(files)[:12])
    return "\n".join(lines[:60])


def _find_ref_file(relpath: str) -> str:
    """Locate ``relpath`` (e.g. models/imm_model.py) under the mount,
    tolerating one extra package directory (imm/, src/, ...)."""
    candidates = [REFERENCE_ROOT] + sorted(
        p for p in glob.glob(os.path.join(REFERENCE_ROOT, "*"))
        if os.path.isdir(p)
    )
    for c in candidates:
        p = os.path.join(c, relpath)
        if os.path.isfile(p):
            return p
    # last resort: anywhere in the tree, unique match required
    hits = glob.glob(
        os.path.join(REFERENCE_ROOT, "**", relpath), recursive=True
    )
    if len(hits) == 1:
        return hits[0]
    pytest.fail(
        f"could not locate {relpath!r} under {REFERENCE_ROOT} "
        f"(hits={hits}); SURVEY §2 expected imm/models/imm_model.py and "
        f"imm/datasets/tps_sampler.py. Mounted tree:\n"
        f"{_tree_summary(REFERENCE_ROOT)}"
    )


@contextlib.contextmanager
def _tf1_as_tensorflow(tf1):
    """Alias sys.modules['tensorflow'] to the v1 shim while importing TF1
    reference code (tf.to_float etc. live only on the v1 surface)."""
    saved = {
        k: sys.modules.get(k) for k in ("tensorflow", "tensorflow.contrib")
    }
    sys.modules["tensorflow"] = tf1
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _import_ref(relpath: str):
    """Import a reference module by file path (dodges package __init__
    side effects), executing it under the TF1 shim."""
    tf1 = _tf1()
    path = _find_ref_file(relpath)
    name = "ref_" + os.path.splitext(os.path.basename(path))[0]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    # reference modules may do intra-package absolute imports
    pkg_root = os.path.dirname(os.path.dirname(path))
    sys.path.insert(0, pkg_root)
    try:
        with _tf1_as_tensorflow(tf1):
            spec.loader.exec_module(mod)
    except Exception as e:  # noqa: BLE001 — convert to actionable failure
        pytest.fail(
            f"importing reference module {path} failed: {type(e).__name__}: "
            f"{e}. If this is a TF1-only API, extend the _tf1_as_tensorflow "
            "shim in this file; if it is a missing sibling import, the "
            "mounted layout differs from SURVEY §2 — adjust _find_ref_file."
        )
    finally:
        sys.path.remove(pkg_root)
    return mod, tf1


def _run_graph(tf1, build):
    """Build fetches inside a fresh graph/session and return numpy values."""
    g = tf1.Graph()
    with g.as_default():
        fetches = build()
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            return sess.run(fetches)


def _first_tensor(out):
    """Reference helpers often return (value, prob) tuples; take the value."""
    if isinstance(out, (tuple, list)):
        return out[0]
    return out


# ---------------------------------------------------------------------------
# 1. Spatial-softmax bottleneck: get_coord vs marginal_softmax_coords
# ---------------------------------------------------------------------------


def test_spatial_softmax_matches_reference():
    """Fixed heatmaps through reference get_coord vs our bottleneck.

    SURVEY §2: ``get_coord(features, axis)`` computes the per-axis marginal
    softmax expectation on a [-1, 1] ruler; our ``marginal_softmax_coords``
    returns the stacked (y, x) pair (the reference's ``gauss_yx``)."""
    from imm_tpu.ops import marginal_softmax_coords

    mod, tf1 = _import_ref("models/imm_model.py")
    get_coord = getattr(mod, "get_coord", None)
    if get_coord is None:
        pytest.fail(
            f"reference models/imm_model.py has no get_coord; found "
            f"callables: "
            f"{sorted(n for n in dir(mod) if not n.startswith('_'))}"
        )

    rng = np.random.default_rng(0)
    heatmaps = rng.normal(size=(2, 16, 12, 5)).astype(np.float32)
    b, h, w, k = heatmaps.shape

    ours = np.asarray(marginal_softmax_coords(heatmaps))  # (B, K, 2) (y, x)

    # Known get_coord signature variants, NHWC axis convention: the
    # y-coordinate reduces over the W axis (other_axis=2), x over H. Each
    # candidate call form gets built + run inside its own fresh graph.
    errors = []
    ref_yx = None
    for i, nargs in enumerate((3, 2)):
        try:
            def build():
                x_tf = tf1.constant(heatmaps)
                if nargs == 3:
                    y = _first_tensor(get_coord(x_tf, 2, h))
                    x = _first_tensor(get_coord(x_tf, 1, w))
                else:
                    y = _first_tensor(get_coord(x_tf, 2))
                    x = _first_tensor(get_coord(x_tf, 1))
                return y, x

            y_np, x_np = _run_graph(tf1, build)
            ref_yx = np.stack([y_np, x_np], axis=-1)  # (B, K, 2)
            break
        except Exception as e:  # noqa: BLE001
            errors.append(f"{nargs}-arg form: {type(e).__name__}: {e}")
    if ref_yx is None:
        sig = None
        try:
            sig = str(inspect.signature(get_coord))
        except (TypeError, ValueError):
            pass
        pytest.fail(
            f"could not call reference get_coord (signature {sig}); "
            f"attempts: {errors}"
        )

    if ref_yx.shape != ours.shape:
        pytest.fail(
            f"shape mismatch: reference gauss_yx {ref_yx.shape} vs ours "
            f"{ours.shape} — check K-channel/axis conventions"
        )
    diff = np.max(np.abs(ref_yx - ours))
    # Tolerate a swapped (x, y) convention by measuring both orders and
    # failing with whichever story the numbers tell.
    diff_swapped = np.max(np.abs(ref_yx[..., ::-1] - ours))
    assert diff <= ATOL or diff_swapped <= ATOL, (
        f"get_coord parity failed: max|Δ|={diff:.3e} as (y,x), "
        f"{diff_swapped:.3e} as (x,y) — if the smaller one passes, the "
        "reference orders coords (x, y); document and adapt here"
    )
    assert diff <= ATOL, (
        f"reference orders coordinates (x, y) (max|Δ|={diff_swapped:.3e} "
        "swapped) — document the convention delta in this docstring"
    )


# ---------------------------------------------------------------------------
# 2. Gaussian re-renderer: get_gaussian_maps vs render_gaussian_maps
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["rot", "flat", "ankush"])
def test_gaussian_maps_match_reference(mode):
    """Fixed coords through reference get_gaussian_maps vs our renderer,
    per mode (SURVEY §2: modes incl. 'rot'/'flat'/'ankush')."""
    from imm_tpu.ops import render_gaussian_maps

    mod, tf1 = _import_ref("models/imm_model.py")
    get_maps = getattr(mod, "get_gaussian_maps", None)
    if get_maps is None:
        pytest.fail(
            "reference models/imm_model.py has no get_gaussian_maps; found: "
            f"{sorted(n for n in dir(mod) if not n.startswith('_'))}"
        )

    rng = np.random.default_rng(1)
    mu = rng.uniform(-0.8, 0.8, size=(2, 5, 2)).astype(np.float32)
    shape_hw, inv_std = (16, 12), 10.0

    ours = np.asarray(
        render_gaussian_maps(mu, shape_hw, inv_std, mode=mode)
    )  # (B, H, W, K)

    errors = []
    ref = None
    for kwargs in ({"mode": mode}, {}):
        if not kwargs and mode != "rot":
            continue  # positional-default call only checks the default mode
        try:
            def build():
                return get_maps(
                    tf1.constant(mu), list(shape_hw), inv_std, **kwargs
                )

            ref = _run_graph(tf1, build)
            break
        except Exception as e:  # noqa: BLE001
            errors.append(f"kwargs={kwargs}: {type(e).__name__}: {e}")
    if ref is None:
        pytest.fail(
            f"could not call reference get_gaussian_maps for mode={mode!r}; "
            f"attempts: {errors}. If the reference names its modes "
            "differently, map them here and document."
        )

    ref = np.asarray(ref)
    if ref.shape != ours.shape:
        pytest.fail(
            f"shape mismatch for mode={mode!r}: reference {ref.shape} vs "
            f"ours {ours.shape} (NHWC expected)"
        )
    diff = np.max(np.abs(ref - ours))
    assert diff <= 1e-4, (
        f"get_gaussian_maps mode={mode!r} parity failed: max|Δ|={diff:.3e} "
        "— compare the exponent forms (rot: exp(-d²/σ²); flat: "
        "exp(-(d²+eps)^0.25); ankush per-axis outer product) and document "
        "any definitional delta"
    )


# ---------------------------------------------------------------------------
# 3. TPS sampler: zero-noise identity law on both implementations
# ---------------------------------------------------------------------------


def test_tps_sampler_identity_matches_reference():
    """TPSRandomSampler with all noise σ=0 must be the identity map (up to
    bilinear-resample epsilon) — the one law comparable across frameworks
    without sharing an RNG (SURVEY §4 golden tests: fixed params through
    both paths)."""
    import jax.numpy as jnp

    from imm_tpu.ops.tps import TPSParams, warp_image

    mod, tf1 = _import_ref("datasets/tps_sampler.py")
    sampler_cls = getattr(mod, "TPSRandomSampler", None)
    if sampler_cls is None:
        pytest.fail(
            "reference datasets/tps_sampler.py has no TPSRandomSampler; "
            f"found: {sorted(n for n in dir(mod) if not n.startswith('_'))}"
        )

    rng = np.random.default_rng(2)
    images = rng.uniform(size=(2, 24, 24, 3)).astype(np.float32)
    h, w = images.shape[1:3]

    # Construct with every noise parameter zeroed, filtering our kwarg set
    # through the actual __init__ signature so minor naming drift fails
    # actionably instead of TypeError-ing.
    want = {
        "height": h, "width": w, "rotsd": 0.0, "scalesd": 0.0,
        "transsd": 0.0, "warpsd": 0.0, "pad": False,
    }
    try:
        params = inspect.signature(sampler_cls.__init__).parameters
    except (TypeError, ValueError):
        params = {}
    unknown_required = [
        n for n, p in params.items()
        if n not in ("self", *want)
        and p.default is inspect.Parameter.empty
        and p.kind not in (inspect.Parameter.VAR_POSITIONAL,
                           inspect.Parameter.VAR_KEYWORD)
    ]
    if unknown_required:
        pytest.fail(
            f"TPSRandomSampler.__init__ requires parameters this test does "
            f"not know: {unknown_required} (full signature: "
            f"{list(params)}) — wire them here with zero-noise values"
        )
    kwargs = {k: v for k, v in want.items() if not params or k in params}

    def build():
        sampler = sampler_cls(**kwargs)
        x_tf = tf1.constant(images)
        for meth in ("forward", "__call__", "transform", "sample"):
            fn = getattr(sampler, meth, None)
            if fn is None:
                continue
            try:
                out = fn(x_tf)
            except TypeError:
                continue
            return _first_tensor(out)
        pytest.fail(
            f"no usable apply method on TPSRandomSampler (tried "
            f"forward/__call__/transform/sample); attrs: "
            f"{sorted(n for n in dir(sampler) if not n.startswith('_'))}"
        )

    try:
        ref_out = np.asarray(_run_graph(tf1, build))
    except Exception as e:  # noqa: BLE001
        pytest.fail(
            f"running reference TPSRandomSampler failed: "
            f"{type(e).__name__}: {e} — it may expect NCHW or uint8 input; "
            "adapt the feed here and document the convention"
        )

    if ref_out.shape[-3:] != images.shape[-3:]:
        pytest.fail(
            f"reference sampler reshaped its input: {images.shape} -> "
            f"{ref_out.shape}; if it pads/crops (pad=True semantics), set "
            "the construction kwargs above accordingly and document"
        )
    # Interior-pixel comparison: border pixels may differ by one bilinear
    # tap between resamplers; the identity law must hold in the interior.
    interior = np.s_[:, 1:-1, 1:-1, :]
    ref_err = np.max(np.abs(ref_out[interior] - images[interior]))
    assert ref_err <= 1e-4, (
        f"reference zero-noise TPS is not identity (interior max|Δ|="
        f"{ref_err:.3e}) — its grid convention differs; compare "
        "_sample_grid against tps_sampler_grid directly"
    )

    # Our side of the same law, same tolerance, for the paired evidence.
    zeros = TPSParams(
        rot=jnp.zeros((2,)), log_scale=jnp.zeros((2,)),
        trans=jnp.zeros((2, 2)), cp_delta=jnp.zeros((2, 16, 2)),
    )
    ours_out = np.asarray(warp_image(jnp.asarray(images), zeros, (h, w)))
    our_err = np.max(np.abs(ours_out[interior] - images[interior]))
    assert our_err <= 1e-4, f"our zero-noise warp not identity: {our_err:.3e}"
