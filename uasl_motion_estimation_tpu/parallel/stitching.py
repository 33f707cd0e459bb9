"""Covariance-weighted trajectory stitching for overlapping segments.

The multi-host scaling story (SURVEY.md section 2.3; BASELINE config 5):
long sequences are split into segments with a few overlapping frames, each
segment runs VO/BA independently (its trajectory lives in its own frame-0
gauge), and the overlap frames — observed by BOTH neighboring segments —
determine the SE(3) transform aligning each segment into its predecessor's
frame. Alignments compose by an associative prefix product, so stitching is
a parallel scan like the pose chain itself.

Per overlap frame k the candidate alignment is A_k = T_prev_k (T_next_k)^-1;
candidates are fused by a weighted mean in the se(3) tangent at the first
candidate, with weights from pose covariances when available (the same
covariance calculus as feature_types.cpp:172-217, driven by ops/geometry's
autodiff jacobians).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import lie


def _se3_log(T: jax.Array) -> jax.Array:
    """(..., 4, 4) -> (..., 6) [rho, theta] (translation first, matching the
    covariance ordering of ops/geometry.py)."""
    theta = lie.so3_log(T[..., :3, :3])
    return jnp.concatenate([T[..., :3, 3], theta], axis=-1)


def _se3_exp(xi: jax.Array) -> jax.Array:
    R = lie.so3_exp(xi[..., 3:6])
    T = jnp.zeros(xi.shape[:-1] + (4, 4), xi.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(xi[..., 0:3])
    return T.at[..., 3, 3].set(1.0)


def align_overlap(
    poses_prev: jax.Array,
    poses_next: jax.Array,
    weights: jax.Array | None = None,
) -> jax.Array:
    """SE(3) alignment A with poses_prev[k] ~= A @ poses_next[k].

    Args:
      poses_prev: (K, 4, 4) the overlap frames in the previous segment's frame.
      poses_next: (K, 4, 4) the same physical frames in the next segment's
        frame.
      weights: optional (K,) confidence weights (e.g. 1/trace(cov)); uniform
        when omitted.

    Returns (4, 4). Fusion: tangent-space weighted mean around the first
    candidate (exact when candidates agree; first-order otherwise).
    """
    cand = jnp.einsum("kij,kjl->kil", poses_prev, jnp.linalg.inv(poses_next))
    base = cand[0]
    base_inv = jnp.linalg.inv(base)
    delta = _se3_log(jnp.einsum("ij,kjl->kil", base_inv, cand))  # (K, 6)
    if weights is None:
        weights = jnp.ones(cand.shape[0], cand.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    mean = jnp.einsum("k,ki->i", w, delta)
    return base @ _se3_exp(mean)


def weights_from_covariances(covs: jax.Array) -> jax.Array:
    """(K, 6, 6) pose covariances -> (K,) inverse-trace confidence weights."""
    return 1.0 / jnp.maximum(
        jnp.trace(covs, axis1=-2, axis2=-1), 1e-12
    )


def chain_covariances_np(motions, motion_covs):
    """Pose covariance along the chain traj[i+1] = traj[i] @ inv(m_i).

    Host-side float64 (the chain itself is composed on the host in float64
    — round-4 precision lesson). ``motions`` (B, 4, 4) frame-to-frame,
    ``motion_covs`` (B, 6, 6) per-motion [dt, dtheta]-tangent covariances
    (e.g. StereoVOResult.cov). Returns (B + 1, 6, 6): traj[0] is the gauge
    anchor with zero covariance; transport uses the adjoint helpers of
    ops/geometry.py (parity-tested vs the autodiff propagation, i.e. the
    reference's poseMultiplicationWithCovariance calculus,
    feature_types.cpp:172-241).
    """
    import numpy as np

    from ..ops.geometry import (
        compose_with_covariance_np,
        invert_with_covariance_np,
    )

    b = len(motions)
    out = np.zeros((b + 1, 6, 6))
    T = np.eye(4)
    C = np.zeros((6, 6))
    for i in range(b):
        inv_m, C_inv = invert_with_covariance_np(
            np.asarray(motions[i], np.float64),
            np.asarray(motion_covs[i], np.float64),
        )
        T, C = compose_with_covariance_np(T, C, inv_m, C_inv)
        out[i + 1] = C
    return out


def overlap_weights_np(cov_prev, cov_next):
    """(K, 6, 6) x2 -> (K,) weights combining BOTH sides' overlap-frame
    uncertainties: w_k = 1 / (tr(C_prev_k) + tr(C_next_k))."""
    import numpy as np

    tr = (np.trace(np.asarray(cov_prev), axis1=-2, axis2=-1)
          + np.trace(np.asarray(cov_next), axis1=-2, axis2=-1))
    return 1.0 / np.maximum(tr, 1e-12)


import functools


@functools.partial(jax.jit, static_argnames=("overlap",))
def stitch_segments(
    segment_poses: jax.Array,
    overlap: int,
    overlap_weights: jax.Array | None = None,
) -> jax.Array:
    """Stitch S overlapping segment trajectories into one global trajectory.

    Args:
      segment_poses: (S, F, 4, 4) cam-to-world poses per segment, each in its
        own frame-0 gauge. Segment s+1's first ``overlap`` frames are the
        same physical frames as segment s's last ``overlap`` frames.
      overlap: number of shared frames between neighbors (>= 1).
      overlap_weights: optional (S-1, overlap) confidence weights.

    Returns (S * (F - overlap) + overlap, 4, 4) stitched poses in segment
    0's frame.
    """
    s, f = segment_poses.shape[0], segment_poses.shape[1]

    def pairwise(i):
        w = None if overlap_weights is None else overlap_weights[i]
        return align_overlap(
            segment_poses[i, f - overlap :],
            segment_poses[i + 1, :overlap],
            w,
        )
    aligns = jax.vmap(pairwise)(jnp.arange(s - 1))  # (S-1, 4, 4)

    # prefix-compose: segment k's gauge transform = A_0 @ ... @ A_{k-1}
    prefixes = jax.lax.associative_scan(
        lambda a, b: jnp.einsum("...ij,...jk->...ik", a, b), aligns, axis=0
    )
    eye = jnp.eye(4, dtype=segment_poses.dtype)[None]
    gauges = jnp.concatenate([eye, prefixes], axis=0)  # (S, 4, 4)

    aligned = jnp.einsum("sij,sfjk->sfik", gauges, segment_poses)
    # drop the duplicated overlap frames of every segment after the first
    head = aligned[0]
    tail = aligned[1:, overlap:].reshape(-1, 4, 4)
    return jnp.concatenate([head, tail], axis=0)
