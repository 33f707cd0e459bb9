"""Monocular visual odometry: batched essential-matrix RANSAC + cheirality.

TPU-native re-design of ``MonoVisualOdometry``
(reference: include/MotionEstimation/vo/MonoVisualOdometry.h:21-53,
src/vo/MonoVisualOdometry.cpp:7-87). The reference delegates its entire
numeric core to OpenCV (``findEssentialMat`` 5-point RANSAC + ``recoverPose``,
MonoVisualOdometry.cpp:20-29); here the whole stack is owned natively and
batched:

* hypotheses: H x 8-point minimal samples solved AT ONCE — the normalized
  8-point algorithm is a batched 8x9 nullspace (SVD) plus a rank-2 projection,
  which vmaps cleanly; the 5-point solver's 10th-degree polynomial root
  finding does not map to the MXU and buys nothing at H=200 samples on
  synthetic-noise regimes, so 8-point is the deliberate design choice;
* scoring: Sampson distance of every match against every hypothesis as one
  (H, N) tensor; argmax inlier count;
* recoverPose: the winning E decomposes into 4 (R, t) candidates; cheirality
  (positive triangulated depth in both views, within the reference's
  50-unit distance cap, MonoVisualOdometry.cpp:29) picks the motion;
* relative scale: geometry.relative_scale (findRelativeScale,
  MonoVisualOdometry.cpp:76-87).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import geometry as geo


class MonoVOParams(NamedTuple):
    """Defaults mirror MonoVisualOdometry::parameters
    (MonoVisualOdometry.h:21-26) + the RANSAC knobs of VisualOdometry.h:32."""

    intr: geo.Intrinsics
    n_ransac: int = 200
    inlier_threshold: float = 1.0  # px, Sampson distance
    min_matches: int = 8  # cpp:9
    min_inliers: int = 10  # cpp:47
    max_depth: float = 50.0  # recoverPose distanceThresh (cpp:29)


class MonoVOResult(NamedTuple):
    R: jax.Array  # (3, 3) rotation prev->cur
    t: jax.Array  # (3,) unit-norm translation
    Rt: jax.Array  # (4, 4) motion matrix (m_Rt, cpp:53-66)
    E: jax.Array  # (3, 3) essential matrix
    inlier_mask: jax.Array  # (N,)
    n_inliers: jax.Array
    pts3d: jax.Array  # (N, 3) triangulated points (prev-camera frame)
    success: jax.Array


def _normalize(uv: jax.Array, intr: geo.Intrinsics) -> jax.Array:
    """Pixel -> normalized camera coordinates."""
    x = (uv[..., 0] - intr.cu) / intr.fu
    y = (uv[..., 1] - intr.cv) / intr.fv
    return jnp.stack([x, y], axis=-1)


def _eight_point(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Essential matrix from >= 8 normalized correspondences (batched-safe).

    Hartley-normalized linear solve + rank-2 / equal-singular-value
    projection. p1, p2: (K, 2).
    """
    # Hartley conditioning: center + isotropic scale
    def condition(p):
        mu = jnp.mean(p, axis=0)
        d = jnp.sqrt(jnp.sum((p - mu) ** 2, axis=-1))
        s = jnp.sqrt(2.0) / jnp.maximum(jnp.mean(d), 1e-9)
        T = jnp.array(
            [[1.0, 0.0, -mu[0]], [0.0, 1.0, -mu[1]], [0.0, 0.0, 1.0 / s]]
        ) * s
        T = T.at[2, 2].set(1.0)
        return (p - mu) * s, T

    q1, T1 = condition(p1)
    q2, T2 = condition(p2)

    x1, y1 = q1[:, 0], q1[:, 1]
    x2, y2 = q2[:, 0], q2[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # (K, 9)
    # nullspace via eigh of A^T A (SVD-free: batched-friendlier)
    _, V = jnp.linalg.eigh(A.T @ A)
    F = V[:, 0].reshape(3, 3)
    F = T2.T @ F @ T1  # un-condition
    # project to essential manifold: singular values (1, 1, 0)
    U, _, Vt = jnp.linalg.svd(F)
    return U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], F.dtype)) @ Vt


def _sampson_sq(E: jax.Array, p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Squared Sampson distance (normalized coords) of matches vs E. (N,)"""
    h1 = geo.to_homogeneous(p1)  # (N, 3)
    h2 = geo.to_homogeneous(p2)
    Ex1 = h1 @ E.T  # (N, 3) = E @ x1
    Etx2 = h2 @ E  # (N, 3) = E^T @ x2
    num = jnp.sum(h2 * Ex1, axis=-1) ** 2
    den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def _triangulate_two_view(R, t, p1, p2):
    """Midpoint-free linear triangulation for P1=[I|0], P2=[R|t]. (N, 3)."""
    # DLT rows for each point: 4x4 system, take nullspace via eigh
    h1 = geo.to_homogeneous(p1)
    h2 = geo.to_homogeneous(p2)
    P2 = jnp.concatenate([R, t[:, None]], axis=1)  # (3, 4)
    P1 = jnp.concatenate(
        [jnp.eye(3, dtype=R.dtype), jnp.zeros((3, 1), R.dtype)], axis=1
    )

    def one(a, b):
        rows = jnp.stack(
            [
                a[0] * P1[2] - P1[0],
                a[1] * P1[2] - P1[1],
                b[0] * P2[2] - P2[0],
                b[1] * P2[2] - P2[1],
            ]
        )
        _, V = jnp.linalg.eigh(rows.T @ rows)
        X = V[:, 0]
        w = jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])
        return X[:3] / w

    return jax.vmap(one)(h1, h2)


def _decompose_E(E: jax.Array):
    """4 candidate (R, t) pairs from E (Hartley-Zisserman)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    return (R1, t), (R1, -t), (R2, t), (R2, -t)


@partial(jax.jit, static_argnames=("params",))
def mono_vo_solve(
    matches: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    params: MonoVOParams,
) -> MonoVOResult:
    """Egomotion from 2-view pixel matches (process(), cpp:7-73).

    Args:
      matches: (N, 2, 2) [prev uv, cur uv] pixel matches (StereoMatch
        semantics, feature_types.h:91-103). N static; pad + mask.
      valid: (N,) bool.
    """
    p = params
    n = matches.shape[0]
    p1 = _normalize(matches[:, 0], p.intr)  # prev
    p2 = _normalize(matches[:, 1], p.intr)  # cur
    # pixel threshold -> normalized units (approx via fu)
    thr2 = (p.inlier_threshold / p.intr.fu) ** 2

    # --- RANSAC over 8-point samples ---
    keys = jax.random.split(key, p.n_ransac)

    def sample(k):
        g = jax.random.gumbel(k, (n,))
        g = jnp.where(valid, g, -jnp.inf)
        _, idx = jax.lax.top_k(g, 8)
        return idx

    samples = jax.vmap(sample)(keys)  # (H, 8)

    def hyp(idx8):
        return _eight_point(p1[idx8], p2[idx8])

    Es = jax.vmap(hyp)(samples)  # (H, 3, 3)
    d2 = jax.vmap(lambda E: _sampson_sq(E, p1, p2))(Es)  # (H, N)
    inl = (d2 < thr2) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)

    # refit on the best inlier set (weighted 8-point over all inliers)
    best_mask = inl[best]
    w = best_mask.astype(p1.dtype)[:, None]
    # weighted refit: zero-out outliers (their rows vanish from A^T A)
    E = _eight_point(p1 * w, p2 * w)
    d2_ref = _sampson_sq(E, p1, p2)
    inlier_mask = (d2_ref < thr2) & valid
    E = jax.lax.cond(
        jnp.sum(inlier_mask) >= jnp.asarray(8, jnp.int32),
        lambda: E,
        lambda: Es[best],
    )
    inlier_mask = (_sampson_sq(E, p1, p2) < thr2) & valid
    n_inliers = jnp.sum(inlier_mask)

    # --- recoverPose: cheirality over the 4 decompositions (cpp:29) ---
    cands = _decompose_E(E)

    def score(RT):
        R, t = RT
        X = _triangulate_two_view(R, t, p1, p2)
        z1 = X[:, 2]
        z2 = (X @ R.T + t)[:, 2]
        good = (
            (z1 > 0) & (z2 > 0) & (z1 < p.max_depth) & inlier_mask
        )
        return jnp.sum(good), X

    scores_X = [score(c) for c in cands]
    scores = jnp.stack([s for s, _ in scores_X])
    Xs = jnp.stack([x for _, x in scores_X])
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    ibest = jnp.argmax(scores)
    R, t, X = Rs[ibest], ts[ibest], Xs[ibest]

    Rt = jnp.eye(4, dtype=R.dtype).at[:3, :3].set(R).at[:3, 3].set(t)
    success = (
        (jnp.sum(valid) >= p.min_matches)
        & (n_inliers >= p.min_inliers)
        & (scores[ibest] > 0)
    )
    return MonoVOResult(
        R=R, t=t, Rt=Rt, E=E, inlier_mask=inlier_mask,
        n_inliers=n_inliers, pts3d=X, success=success,
    )
