"""Oracle controls for the synthetic harness's K-landmark floor (VERDICT r2 #1).

Round 2 reported TPS-pair K=10 flooring at 5.90 %IOD (K=30: 2.24) and claimed
"capacity, not recipe" without a control. This script measures two oracles
that bound what ANY unsupervised K-landmark method can score on this harness
under the standard eval protocol (the same fixed eval sets the sweep and
convergence runs used: ``SyntheticBlobFaces.sample`` with keys 91/92,
n=1024, image 128, %IOD on eye points (0, 1) — see ``experiment.py``):

A. **GT-parts regression** — feed the generator's own ground-truth part
   coordinates through the eval ridge regression. The protocol's numeric
   floor: any gap above ~0 is regression/annotation noise, not modeling.

B. **Supervised K-landmark encoder** — the SAME PoseEncoder trunk +
   spatial-softmax coordinate bottleneck as the unsupervised model
   (``models/nets.py``, ``ops/coords.py``), trained *supervised*: a linear
   head maps its K bottleneck coordinates to the 5 annotated points, L2
   loss on ground truth. Scored with the standard protocol (ridge refit
   from its K coords). This is the tightest available bound on what the
   architecture + bottleneck can represent at a given K: if the
   unsupervised 5.90 sits far above the supervised K=10 oracle, the
   recipe/loss is the gap; if near it, K-capacity is.

Writes one JSON line per measurement to --out (resumable: recorded names
are skipped) and prints a summary table.

Usage:
    python scripts/oracle_floor.py [--steps 6000] [--k 5,10,30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVAL_KEY_TRAIN, EVAL_KEY_TEST = 91, 92  # experiment.py's fixed eval sets
EVAL_N = 1024
IMAGE_SIZE = 128


def eval_sets():
    import jax

    from imm_tpu.data import SyntheticBlobFaces

    faces = SyntheticBlobFaces(image_size=IMAGE_SIZE)
    sample = jax.jit(lambda r: faces.sample(r, EVAL_N))
    train = jax.device_get(sample(jax.random.PRNGKey(EVAL_KEY_TRAIN)))
    test = jax.device_get(sample(jax.random.PRNGKey(EVAL_KEY_TEST)))
    return train, test


def gt_parts_oracle(train, test) -> dict:
    """Control A: the annotated points themselves as the predicted coords."""
    import jax.numpy as jnp

    from imm_tpu.eval.regression import (
        fit_landmark_regressor,
        landmark_error,
        predict_landmarks,
    )

    w = fit_landmark_regressor(
        jnp.asarray(train["landmarks"]), jnp.asarray(train["landmarks"])
    )
    err_test = landmark_error(
        predict_landmarks(w, jnp.asarray(test["landmarks"])),
        jnp.asarray(test["landmarks"]),
        norm="iod",
    )
    return {"name": "gt_parts", "test_pct": float(err_test)}


def supervised_oracle(k: int, steps: int, batch: int, train, test,
                      temporal: bool = False, pose_gap: float = 0.0) -> dict:
    """Control B: supervised PoseEncoder+bottleneck at K landmarks.

    ``temporal=True`` measures the ceiling for the TEMPORAL protocol
    (VERDICT r4 next #4): the supervised stream is drawn exactly as the
    temporal recipe's image stream — ``sample_pair`` frames (same identity,
    two poses at ``pose_gap``; gap 0 = the shipped temporal recipe, where
    each frame's marginal equals the pose prior but identities repeat twice
    per batch). The trunk, bottleneck, eval sets, and scoring protocol are
    unchanged, so the two oracles differ only by what the temporal model
    could ever differ by: its training-image stream.
    """
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from imm_tpu.data import SyntheticBlobFaces
    from imm_tpu.eval.regression import evaluate_landmarks
    from imm_tpu.models.nets import PoseEncoder
    from imm_tpu.ops.coords import marginal_softmax_coords

    n_annotated = train["landmarks"].shape[1]

    class SupervisedPose(nn.Module):
        """PoseEncoder -> spatial-softmax coords -> linear head to GT points.

        The gradient flows THROUGH the coordinate bottleneck, so the oracle
        respects the same representational constraint as the unsupervised
        model: all landmark information must pass as K softmax expectations.
        """

        n_landmarks: int

        @nn.compact
        def __call__(self, image, train: bool = True):
            heatmaps = PoseEncoder(
                self.n_landmarks, dtype=jnp.bfloat16, name="pose_encoder"
            )(image, train)
            coords = marginal_softmax_coords(heatmaps.astype(jnp.float32))
            pred = nn.Dense(2 * n_annotated, name="readout")(
                coords.reshape(coords.shape[0], -1)
            )
            return coords, pred.reshape(-1, n_annotated, 2)

    model = SupervisedPose(n_landmarks=k)
    faces = SyntheticBlobFaces(image_size=IMAGE_SIZE,
                               pair_pose_gap=pose_gap)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((2, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32)
    variables = model.init(rng, dummy)
    params, batch_stats = variables["params"], variables["batch_stats"]

    lr = optax.piecewise_constant_schedule(
        1e-3, {int(steps * 0.6): 0.3, int(steps * 0.85): 0.1}
    )
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(params, stats, rng):
        if temporal:
            d2 = faces.sample_pair(rng, batch // 2)
            images = jnp.concatenate([d2["image_a"], d2["image_b"]])
            targets = jnp.concatenate(
                [d2["landmarks_a"], d2["landmarks_b"]]
            )
        else:
            d = faces.sample(rng, batch)
            images, targets = d["image"], d["landmarks"]
        (coords, pred), mut = model.apply(
            {"params": params, "batch_stats": stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        loss = jnp.mean(jnp.square(pred - targets))
        return loss, mut["batch_stats"]

    def one(carry, rng):
        params, stats, opt_state = carry
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, stats, opt_state), loss

    scan_len = 50

    @jax.jit
    def run_window(carry, rng):
        rngs = jax.random.split(rng, scan_len)
        carry, losses = jax.lax.scan(one, carry, rngs)
        return carry, losses.mean()

    carry = (params, batch_stats, opt_state)
    t0 = time.time()
    rng = jax.random.PRNGKey(1)
    n_windows = steps // scan_len
    for i in range(n_windows):
        rng, kk = jax.random.split(rng)
        carry, loss = run_window(carry, kk)
        if i % max(1, n_windows // 10) == 0 or i == n_windows - 1:
            print(
                f"  [k={k}] step {(i + 1) * scan_len}/{steps} "
                f"loss={float(loss):.5f} ({time.time() - t0:.0f}s)",
                flush=True,
            )
    params, batch_stats, _ = carry

    def coords_fn(params, stats, images):
        coords, _ = model.apply(
            {"params": params, "batch_stats": stats}, images, train=False
        )
        return coords

    coords_fn = jax.jit(coords_fn)
    res = evaluate_landmarks(
        coords_fn, params, batch_stats, train, test, norm="iod"
    )
    name = f"supervised_k{k}"
    if temporal:
        name = f"supervised_temporal_k{k}"
        if pose_gap:
            name += f"_gap{pose_gap:g}"
    return {
        "name": name,
        "k": k,
        "steps": steps,
        "batch": batch,
        "test_pct": round(res["landmark_error_test_pct"], 3),
        "train_pct": round(res["landmark_error_train_pct"], 3),
        "wall_s": round(time.time() - t0, 1),
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=6000)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--k", default="5,10,30")
    parser.add_argument("--temporal", action="store_true",
                        help="measure the temporal-protocol ceiling: train "
                             "the supervised oracle on sample_pair frames "
                             "(the temporal recipe's image stream) instead "
                             "of i.i.d. single frames")
    parser.add_argument("--pose-gap", type=float, default=0.0,
                        help="pair_pose_gap for --temporal (0 = shipped "
                             "temporal recipe)")
    parser.add_argument("--out", default="docs/artifacts/oracle_floor.jsonl")
    args = parser.parse_args(argv)

    from imm_tpu.cli._common import enable_compile_cache

    enable_compile_cache()
    import jax

    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            done = {json.loads(ln)["name"] for ln in f if ln.strip()}

    train, test = eval_sets()

    def record(rec):
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[oracle] {rec['name']}: test={rec['test_pct']:.3f} %IOD",
              flush=True)

    if "gt_parts" not in done:
        record(gt_parts_oracle(train, test))
    for k in [int(x) for x in args.k.split(",")]:
        name = f"supervised_k{k}"
        if args.temporal:
            name = f"supervised_temporal_k{k}"
            if args.pose_gap:
                name += f"_gap{args.pose_gap:g}"
        if name in done:
            print(f"[oracle] {name}: already recorded, skipping", flush=True)
            continue
        record(supervised_oracle(k, args.steps, args.batch, train, test,
                                 temporal=args.temporal,
                                 pose_gap=args.pose_gap))
        jax.clear_caches()


if __name__ == "__main__":
    main()
