"""Dense ZNCC disparity cost volume — the TPU-native epipolar matcher core.

The naive formulation (gather a patch per feature per candidate disparity)
issues O(N_feats * D * patch) random-access gathers, which is the worst
possible access pattern for the TPU memory system. Instead, ZNCC over a
square window is computed DENSELY for the whole image from box-filtered
moments:

  zncc_d(p) = (box(L * R_d) - box(L) box(R_d))
              / sqrt(var(L) var(R_d)),     R_d = right shifted d pixels

which is pure elementwise math + separable box filters (VPU-regular, no
gathers), scanned over d with per-step sampling at the feature locations so
the full (D, H, W) volume is never materialized. Replaces the reference's
per-ROI ``applyCCOEFFNormed`` (mutual_information.cpp:136-140) scaled to all
features x disparities at once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import image as im


def _box_mean(img: jax.Array, radius: int) -> jax.Array:
    k = jnp.ones(2 * radius + 1, img.dtype) / (2 * radius + 1)
    return im._sep_filter(img, k, k)


@partial(jax.jit, static_argnames=("max_disparity", "radius"))
def zncc_disparity_scores(
    left: jax.Array,
    right: jax.Array,
    feats_xy: jax.Array,
    max_disparity: int,
    radius: int,
    eps: float = 1e-6,
) -> jax.Array:
    """(N, D) ZNCC score of each left feature against right candidates.

    Args:
      left, right: (H, W) rectified grayscale images.
      feats_xy: (N, 2) float (x, y) feature locations in the left image
        (sampled at the nearest pixel; sub-pixel disparity comes from the
        caller's parabola refinement over d).
      max_disparity: candidate disparities d in [0, max_disparity).
      radius: ZNCC window radius.

    Returns (N, D) scores in [-1, 1]; out-of-image candidates get -inf.
    """
    h, w = left.shape
    dtype = left.dtype
    n = feats_xy.shape[0]

    xi = jnp.clip(jnp.round(feats_xy[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(feats_xy[:, 1]).astype(jnp.int32), 0, h - 1)
    flat_idx = yi * w + xi

    mL = _box_mean(left, radius)
    varL = jnp.maximum(_box_mean(left * left, radius) - mL * mL, 0.0)
    mR = _box_mean(right, radius)
    varR = jnp.maximum(_box_mean(right * right, radius) - mR * mR, 0.0)

    # pad on the left so shift-by-d is a dynamic_slice (value at (y, x)
    # becomes img[y, x - d]); the scan never materializes the (D, H, W) volume
    def step(carry, d):
        del carry
        Rd = jax.lax.dynamic_slice(
            padR, (0, max_disparity - d), (h, w)
        )
        mRd = jax.lax.dynamic_slice(padmR, (0, max_disparity - d), (h, w))
        varRd = jax.lax.dynamic_slice(padvR, (0, max_disparity - d), (h, w))
        cross = _box_mean(left * Rd, radius) - mL * mRd
        denom = jnp.sqrt(varL * varRd)
        z = cross / jnp.maximum(denom, eps)
        # candidate in-bounds: x - d - radius >= 0
        ok = (xi - d - radius) >= 0
        vals = jnp.where(ok, z.ravel()[flat_idx], -jnp.inf)
        return 0, vals

    padR = jnp.pad(right, ((0, 0), (max_disparity, 0)))
    padmR = jnp.pad(mR, ((0, 0), (max_disparity, 0)))
    padvR = jnp.pad(varR, ((0, 0), (max_disparity, 0)))

    _, scores = jax.lax.scan(
        step, 0, jnp.arange(max_disparity, dtype=jnp.int32)
    )  # (D, N)
    return scores.T.astype(dtype)  # (N, D)
