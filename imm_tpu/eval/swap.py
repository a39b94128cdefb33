"""Pose-swap (landmark-conditioned generation) inference.

Reference behavior (SURVEY.md §3.4, driver config 5): content features from
image A + pose landmarks from image B -> an image with A's appearance in B's
pose. One jitted forward with mixed inputs. ``swap_fn`` is the canonical
forward — ``eval.export`` serializes exactly this function to StableHLO.
"""

from __future__ import annotations

import jax

from imm_tpu.models.imm import IMM


def swap_fn(model: IMM, params, batch_stats):
    """-> fn(appearance, pose): the swap forward on frozen variables."""

    def fn(appearance, pose):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        content = model.apply(variables, appearance, method=model.encode_content)
        coords, _ = model.apply(variables, pose, method=model.encode_pose)
        return model.apply(variables, content, coords, method=model.generate)

    return fn


def pose_swap(model: IMM, params, batch_stats, appearance_images, pose_images):
    """(B,H,W,3) x2 -> (B,H,W,3) generated swaps."""
    return jax.jit(swap_fn(model, params, batch_stats))(
        appearance_images, pose_images
    )
