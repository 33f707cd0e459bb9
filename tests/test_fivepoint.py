"""Exact 5-point minimal essential solver (ops/fivepoint.py).

Reference parity target: the Nister 5-point inside cv::findEssentialMat
(reference: src/vo/MonoVisualOdometry.cpp:20). Tier-1/2 tests per
SURVEY.md section 4: candidate set contains the true E on exact synthetic
geometry; every emitted candidate satisfies the epipolar and essential-
manifold constraints; the whole solver vmaps over samples.
"""

import jax
import jax.numpy as jnp
import numpy as np

from uasl_motion_estimation_tpu.ops.fivepoint import fivepoint_candidates


def _rot(axis, ang):
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K


def _scene(seed, ang=0.2):
    rng = np.random.default_rng(seed)
    R = _rot(rng.normal(size=3), ang)
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    X = rng.uniform(-2, 2, size=(5, 3))
    X[:, 2] = rng.uniform(4, 10, size=5)
    x1 = X[:, :2] / X[:, 2:3]
    X2 = X @ R.T + t
    x2 = X2[:, :2] / X2[:, 2:3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    return x1.astype(np.float32), x2.astype(np.float32), E / np.linalg.norm(E)


class TestFivePoint:
    def test_recovers_true_essential(self):
        """The candidate set contains the ground-truth E (up to sign/scale)
        in the vast majority of random configurations; RANSAC absorbs the
        rare f32 sign-noise miss."""
        hits = 0
        for seed in range(30):
            x1, x2, Etrue = _scene(seed)
            Es, valid = fivepoint_candidates(jnp.asarray(x1), jnp.asarray(x2))
            Es, valid = np.asarray(Es), np.asarray(valid)
            best = min(
                (
                    min(np.linalg.norm(E - Etrue), np.linalg.norm(E + Etrue))
                    for E, v in zip(Es, valid)
                    if v
                ),
                default=np.inf,
            )
            hits += best < 1e-2
        assert hits >= 25, f"only {hits}/30 scenes recovered the true E"

    def test_candidates_satisfy_constraints(self):
        """Every valid candidate: epipolar residual ~ 0 on the 5 points and
        the essential-manifold cubics ~ 0 (det E and trace constraint)."""
        for seed in range(5):
            x1, x2, _ = _scene(seed)
            Es, valid = fivepoint_candidates(jnp.asarray(x1), jnp.asarray(x2))
            Es, valid = np.asarray(Es), np.asarray(valid)
            h1 = np.c_[x1, np.ones(5)]
            h2 = np.c_[x2, np.ones(5)]
            assert valid.any()
            for E, v in zip(Es, valid):
                if not v:
                    continue
                epi = np.abs(np.einsum("ni,ij,nj->n", h2, E, h1))
                assert epi.max() < 5e-3, epi
                assert abs(np.linalg.det(E)) < 5e-3
                EEt = E @ E.T
                trc = 2.0 * EEt @ E - np.trace(EEt) * E
                assert np.abs(trc).max() < 2e-2

    def test_vmaps_over_samples(self):
        xs = [np.stack(_scene(s)[:2]) for s in range(8)]  # (8, 2, 5, 2)
        batch = jnp.asarray(np.stack(xs))
        Es, valid = jax.vmap(
            lambda b: fivepoint_candidates(b[0], b[1])
        )(batch)
        assert Es.shape == (8, 10, 3, 3)
        assert valid.shape == (8, 10)
        assert bool(valid.any(axis=1).all())

    def test_pure_rotation_degeneracy_masked(self):
        """t = 0: E = 0 is the only solution — the solver must not emit
        NaN/Inf candidates (validity mask may keep sign-change roots, but
        the matrices stay finite for the downstream scorer)."""
        rng = np.random.default_rng(0)
        R = _rot([0.2, 1.0, 0.1], 0.15)
        X = rng.uniform(-2, 2, size=(5, 3))
        X[:, 2] = rng.uniform(4, 10, size=5)
        x1 = X[:, :2] / X[:, 2:3]
        X2 = X @ R.T
        x2 = X2[:, :2] / X2[:, 2:3]
        Es, valid = fivepoint_candidates(
            jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)
        )
        assert bool(jnp.all(jnp.isfinite(jnp.where(valid[:, None, None], Es, 0.0))))
