"""Procedural blob-face dataset with known ground-truth landmarks.

The offline stand-in for CelebA/AFLW (SURVEY.md §4 "Integration"): no real
datasets or network exist on this machine, so training and the full
landmark-regression eval protocol run against procedurally generated faces
whose true landmarks are known by construction. Samples are generated *on
device* from a PRNG key — the input pipeline costs one fused kernel, so the
TPU never waits on the host.

Each face = an elliptical head + 5 colored blob parts (two eyes, nose, two
mouth corners) over a smooth background. Identity (colors, part offsets) and
pose (similarity transform of the part template) are independent latents, so
the generator can emit video-style frame pairs: same identity, two poses —
exactly the structure IMM exploits.

Ground truth: part centers in [-1, 1] (y, x); inter-ocular distance is the
eye-blob separation, giving the %IOD eval metric a meaningful denominator.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# Part template in face frame: (y, x) in [-1, 1]-ish face units.
_TEMPLATE = np.array(
    [
        [-0.15, -0.22],  # left eye
        [-0.15, 0.22],  # right eye
        [0.08, 0.0],  # nose
        [0.32, -0.18],  # mouth left
        [0.32, 0.18],  # mouth right
    ],
    np.float32,
)
_PART_SIGMA = np.array([0.06, 0.06, 0.05, 0.045, 0.045], np.float32)
_HEAD_SIGMA = np.array([0.55, 0.45], np.float32)  # (y, x) ellipse sigmas


@dataclasses.dataclass(frozen=True, unsafe_hash=True)
class SyntheticBlobFaces:
    """On-device generator; all methods are jit-safe pure functions."""

    image_size: int = 128
    rot_sd: float = 0.25  # radians of pose rotation
    scale_sd: float = 0.12  # log-scale sd
    trans_range: float = 0.25  # uniform center offset
    offset_sd: float = 0.03  # identity-specific part offsets
    noise_sd: float = 0.02
    dtype: str = "float32"  # 'bfloat16' keeps the whole data path off f32
    # Pose correlation between the two frames of ``sample_pair``. 0 (default)
    # draws the two poses independently — the Δ→∞ limit of video frame
    # pairs. g in (0, 1] interpolates frame A's pose toward a fresh
    # independent draw (scale in log-space): g=1 is bitwise the independent
    # draw, smaller g models temporally closer frames, pose marginals stay
    # inside the prior's support at every g (the real-video frame-gap knob,
    # SURVEY §2 H36M "samples temporal (frame_t, frame_t+Δ) pairs").
    pair_pose_gap: float = 0.0

    @property
    def n_landmarks(self) -> int:
        return _TEMPLATE.shape[0]

    # -- latents ----------------------------------------------------------

    def _identity(self, rng, batch):
        k_col, k_off, k_bg = jax.random.split(rng, 3)
        part_colors = jax.random.uniform(
            k_col, (batch, 1 + self.n_landmarks, 3), minval=0.15, maxval=1.0
        )
        offsets = jax.random.normal(k_off, (batch, self.n_landmarks, 2)) * self.offset_sd
        bg = jax.random.uniform(k_bg, (batch, 2, 3), minval=0.0, maxval=0.6)
        return part_colors, offsets, bg

    def _pose(self, rng, batch):
        k_r, k_s, k_t = jax.random.split(rng, 3)
        rot = jax.random.normal(k_r, (batch,)) * self.rot_sd
        scale = jnp.exp(jax.random.normal(k_s, (batch,)) * self.scale_sd)
        center = jax.random.uniform(
            k_t, (batch, 2), minval=-self.trans_range, maxval=self.trans_range
        )
        return rot, scale, center

    def _landmarks(self, offsets, rot, scale, center):
        """Apply the pose similarity to the (identity-offset) template."""
        pts = jnp.asarray(_TEMPLATE)[None] + offsets  # (B, K, 2)
        cos = (jnp.cos(rot) * scale)[:, None]
        sin = (jnp.sin(rot) * scale)[:, None]
        y = cos * pts[:, :, 0] - sin * pts[:, :, 1] + center[:, None, 0]
        x = sin * pts[:, :, 0] + cos * pts[:, :, 1] + center[:, None, 1]
        return jnp.stack([y, x], axis=-1)  # (B, K, 2)

    # -- rendering --------------------------------------------------------

    def _render(self, landmarks, part_colors, bg, rot, scale, center, rng):
        s = self.image_size
        b = landmarks.shape[0]
        ys = jnp.linspace(-1.0, 1.0, s)
        gy, gx = jnp.meshgrid(ys, ys, indexing="ij")  # (S, S)

        # Background: vertical gradient between two identity colors.
        t = (gy[None, :, :, None] + 1.0) * 0.5
        canvas = bg[:, 0][:, None, None, :] * (1 - t) + bg[:, 1][:, None, None, :] * t

        # Head: rotated anisotropic Gaussian ellipse, painter-composited.
        dy = gy[None] - center[:, 0, None, None]
        dx = gx[None] - center[:, 1, None, None]
        cos = jnp.cos(rot)[:, None, None]
        sin = jnp.sin(rot)[:, None, None]
        sc = scale[:, None, None]
        # rotate into face frame and undo scale
        fy = (cos * dy + sin * dx) / sc
        fx = (-sin * dy + cos * dx) / sc
        head_a = jnp.exp(
            -0.5 * ((fy / _HEAD_SIGMA[0]) ** 2 + (fx / _HEAD_SIGMA[1]) ** 2)
        )
        head_a = jnp.clip(head_a * 1.4, 0.0, 1.0)[..., None]
        canvas = canvas * (1 - head_a) + part_colors[:, 0][:, None, None, :] * head_a

        # Parts: isotropic Gaussians at landmark positions (scaled with pose).
        sig = jnp.asarray(_PART_SIGMA)[None] * scale[:, None]  # (B, K)
        for k in range(self.n_landmarks):
            d2 = (gy[None] - landmarks[:, k, 0, None, None]) ** 2 + (
                gx[None] - landmarks[:, k, 1, None, None]
            ) ** 2
            a = jnp.exp(-0.5 * d2 / (sig[:, k, None, None] ** 2 + 1e-8))
            a = jnp.clip(a * 1.5, 0.0, 1.0)[..., None]
            color = part_colors[:, 1 + k][:, None, None, :]
            canvas = canvas * (1 - a) + color * a

        noise = jax.random.normal(rng, canvas.shape) * self.noise_sd
        out = jnp.clip(canvas + noise, 0.0, 1.0)
        return out.astype(jnp.dtype(self.dtype))

    # -- public API -------------------------------------------------------

    def sample(self, rng: jax.Array, batch: int) -> dict[str, jnp.ndarray]:
        """One frame per identity: {'image': (B,S,S,3), 'landmarks': (B,K,2)}."""
        k_id, k_pose, k_n = jax.random.split(rng, 3)
        part_colors, offsets, bg = self._identity(k_id, batch)
        rot, scale, center = self._pose(k_pose, batch)
        lm = self._landmarks(offsets, rot, scale, center)
        img = self._render(lm, part_colors, bg, rot, scale, center, k_n)
        return {"image": img, "landmarks": lm}

    def _pose_near(self, rng, pose_a, batch):
        """Frame-B pose: interpolate A's pose toward a fresh independent
        draw by ``g = pair_pose_gap`` (scale in log-space).

        Chosen over additive perturbation (the original form) because it
        gets all three properties at once: the A→B delta scales with g for
        every component uniformly (the additive form under-scaled the
        uniform translation by sqrt(2) relative to rot/scale — round-4
        review finding), frame B's pose stays inside the pose prior's
        support (the additive center could reach (1+g)·trans_range), and
        both endpoints are exact — g=0 is frame A, g=1 is bitwise the
        independent draw (``rng`` feeds ``_pose`` exactly as the gap<=0
        branch does)."""
        g = self.pair_pose_gap
        rot_a, scale_a, center_a = pose_a
        rot_f, scale_f, center_f = self._pose(rng, batch)
        rot = (1.0 - g) * rot_a + g * rot_f
        scale = scale_a ** (1.0 - g) * scale_f**g
        center = (1.0 - g) * center_a + g * center_f
        return rot, scale, center

    def sample_pair(self, rng: jax.Array, batch: int) -> dict[str, jnp.ndarray]:
        """Video-style pair: same identity, two poses (independent at
        ``pair_pose_gap=0``, A-correlated otherwise)."""
        k_id, k_p1, k_p2, k_n1, k_n2 = jax.random.split(rng, 5)
        part_colors, offsets, bg = self._identity(k_id, batch)
        pose_a = self._pose(k_p1, batch)
        # gap=0 keeps the original independent draw from the SAME key, so
        # pre-existing runs stay bitwise seed-reproducible
        pose_b = (
            self._pose(k_p2, batch)
            if self.pair_pose_gap <= 0
            else self._pose_near(k_p2, pose_a, batch)
        )
        out = {}
        for name, pose, k_n in (("a", pose_a, k_n1), ("b", pose_b, k_n2)):
            rot, scale, center = pose
            lm = self._landmarks(offsets, rot, scale, center)
            img = self._render(lm, part_colors, bg, rot, scale, center, k_n)
            out[f"image_{name}"] = img
            out[f"landmarks_{name}"] = lm
        return out

    @staticmethod
    def interocular(landmarks: jnp.ndarray) -> jnp.ndarray:
        """(B, K, 2) -> (B,) eye separation (the %IOD denominator)."""
        return jnp.linalg.norm(landmarks[:, 0] - landmarks[:, 1], axis=-1)
