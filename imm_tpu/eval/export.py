"""Model export for serving.

The reference has no serving story (research code); this framework targets
production deployment, so the trained pose encoder (the useful inference
artifact: image -> K landmarks) and the full swap generator are exportable
as serialized StableHLO via ``jax.export`` — loadable from any JAX process
(or other StableHLO consumers) without the Python model code, and
AOT-compilable for the target TPU topology.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def landmark_fn(model, params, batch_stats):
    """The serving function: images (B,S,S,3) in [0,1] -> (B,K,2) coords."""

    def fn(images):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        coords, _ = model.apply(variables, images, method=model.encode_pose)
        return coords

    return fn


def export_landmarker(
    model, params, batch_stats, batch: int, image_size: int
) -> bytes:
    """Serialize the landmark detector to portable StableHLO bytes."""
    from jax import export as jax_export

    fn = landmark_fn(model, params, batch_stats)
    spec = jax.ShapeDtypeStruct((batch, image_size, image_size, 3), jnp.float32)
    exported = jax_export.export(jax.jit(fn))(spec)
    return exported.serialize()


def load_landmarker(blob: bytes):
    """Deserialize an exported landmark detector into a callable."""
    from jax import export as jax_export

    exported = jax_export.deserialize(blob)
    return lambda images: exported.call(images)


def export_swap_generator(
    model, params, batch_stats, batch: int, image_size: int
) -> bytes:
    """Serialize the full pose-swap generator to portable StableHLO bytes.

    The exported program is ``eval.swap.swap_fn`` — the exact forward
    ``pose_swap`` runs, so the serving artifact can never diverge from the
    in-process swap path.
    """
    from jax import export as jax_export

    from imm_tpu.eval.swap import swap_fn

    fn = swap_fn(model, params, batch_stats)
    spec = jax.ShapeDtypeStruct((batch, image_size, image_size, 3), jnp.float32)
    exported = jax_export.export(jax.jit(fn))(spec, spec)
    return exported.serialize()


def load_swap_generator(blob: bytes):
    """Deserialize an exported swap generator into a callable."""
    from jax import export as jax_export

    exported = jax_export.deserialize(blob)
    return lambda appearance, pose: exported.call(appearance, pose)


def save_landmarker(path: str, model, params, batch_stats, batch, image_size):
    with open(path, "wb") as f:
        f.write(export_landmarker(model, params, batch_stats, batch, image_size))


def load_landmarker_file(path: str):
    with open(path, "rb") as f:
        return load_landmarker(f.read())
