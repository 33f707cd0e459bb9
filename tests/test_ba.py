"""Windowed-BA tests on synthetic geometry (SURVEY.md section 4, tier 2):
known poses + points, exact projections, perturbed initialization must
re-converge; Huber must reject injected outliers."""

import jax.numpy as jnp
import numpy as np
import pytest

from uasl_motion_estimation_tpu.ops import geometry as geo, lie
from uasl_motion_estimation_tpu.solvers.ba import (
    BAConfig,
    BAProblem,
    ba_camera_covariances,
    ba_solve,
)

INTR = geo.Intrinsics(fu=400.0, fv=400.0, cu=320.0, cv=240.0)
BASELINE = 0.5


def make_window(n_frames=6, n_pts=120, noise=0.0, stereo=True, seed=7):
    """Ground-truth forward-motion window with exact projections."""
    RNG = np.random.default_rng(seed)
    cams = []
    for i in range(n_frames):
        aa = np.array([0.002 * i, 0.004 * i, 0.001 * i])
        t = np.array([0.05 * i, 0.02 * i, -0.8 * i])  # world->cam translation
        cams.append(np.concatenate([aa, t]))
    cams = np.asarray(cams, np.float32)

    pts = np.stack(
        [
            RNG.uniform(-8, 8, n_pts),
            RNG.uniform(-3, 3, n_pts),
            RNG.uniform(8, 30, n_pts),
        ],
        axis=-1,
    ).astype(np.float32)

    R = 4 if stereo else 2
    obs = np.zeros((n_frames, n_pts, R), np.float32)
    mask = np.zeros((n_frames, n_pts), bool)
    for w, cam in enumerate(cams):
        Rm = np.asarray(lie.so3_exp(jnp.asarray(cam[:3])))
        pc = pts @ Rm.T + cam[3:6]
        z = pc[:, 2]
        ul = INTR.fu * pc[:, 0] / z + INTR.cu
        v = INTR.fv * pc[:, 1] / z + INTR.cv
        if stereo:
            ur = INTR.fu * (pc[:, 0] - BASELINE) / z + INTR.cu
            obs[w] = np.stack([ul, v, ur, v], -1)
        else:
            obs[w] = np.stack([ul, v], -1)
        mask[w] = (z > 1.0) & (ul > 0) & (ul < 640) & (v > 0) & (v < 480)
    obs += RNG.normal(scale=noise, size=obs.shape)
    return cams, pts, obs, mask


def perturb(cams, pts, cam_scale=0.01, pt_scale=0.3, seed=13):
    RNG = np.random.default_rng(seed)
    cams_p = cams.copy()
    cams_p[2:] += RNG.normal(scale=cam_scale, size=cams_p[2:].shape)
    pts_p = pts + RNG.normal(scale=pt_scale, size=pts.shape)
    return cams_p.astype(np.float32), pts_p.astype(np.float32)


class TestStereoBA:
    def test_recovers_exact_geometry(self):
        cams, pts, obs, mask = make_window()
        cams_p, pts_p = perturb(cams, pts)
        cfg = BAConfig(intr=INTR, baseline=BASELINE)
        res = ba_solve(
            BAProblem(jnp.asarray(cams_p), jnp.asarray(pts_p),
                      jnp.asarray(obs), jnp.asarray(mask)),
            cfg,
        )
        assert float(res.cost) < 1e-2, float(res.cost)
        np.testing.assert_allclose(np.asarray(res.cam), cams, atol=2e-3)

    def test_huber_rejects_outliers(self):
        cams, pts, obs, mask = make_window(noise=0.2)
        # corrupt 10% of observations badly
        rng = np.random.default_rng(21)
        n_bad = int(0.1 * mask.sum())
        ws, ms = np.nonzero(mask)
        sel = rng.choice(len(ws), n_bad, replace=False)
        obs[ws[sel], ms[sel]] += rng.uniform(30, 80, (n_bad, obs.shape[-1]))
        cams_p, pts_p = perturb(cams, pts)
        cfg = BAConfig(intr=INTR, baseline=BASELINE)
        res = ba_solve(
            BAProblem(jnp.asarray(cams_p), jnp.asarray(pts_p),
                      jnp.asarray(obs), jnp.asarray(mask)),
            cfg,
        )
        # camera translation recovered despite outliers
        np.testing.assert_allclose(
            np.asarray(res.cam)[:, 3:6], cams[:, 3:6], atol=0.05
        )

    def test_fixed_frames_stay_fixed(self):
        cams, pts, obs, mask = make_window()
        cams_p, pts_p = perturb(cams, pts)
        cfg = BAConfig(intr=INTR, baseline=BASELINE, n_fixed=2)
        res = ba_solve(
            BAProblem(jnp.asarray(cams_p), jnp.asarray(pts_p),
                      jnp.asarray(obs), jnp.asarray(mask)),
            cfg,
        )
        np.testing.assert_array_equal(np.asarray(res.cam)[:2], cams_p[:2])

    def test_covariances_psd_and_scaled(self):
        cams, pts, obs, mask = make_window(noise=0.5)
        cfg = BAConfig(intr=INTR, baseline=BASELINE)
        covs = np.asarray(
            ba_camera_covariances(
                BAProblem(jnp.asarray(cams), jnp.asarray(pts),
                          jnp.asarray(obs), jnp.asarray(mask)),
                cfg,
            )
        )
        assert covs.shape == (6, 6, 6)
        for w in range(2, 6):
            eig = np.linalg.eigvalsh(covs[w])
            assert (eig > 0).all(), (w, eig)


class TestMonoBA:
    def test_recovers_geometry(self):
        cams, pts, obs, mask = make_window(stereo=False)
        cams_p, pts_p = perturb(cams, pts, cam_scale=0.005)
        cfg = BAConfig(intr=INTR, baseline=0.0)
        res = ba_solve(
            BAProblem(jnp.asarray(cams_p), jnp.asarray(pts_p),
                      jnp.asarray(obs), jnp.asarray(mask)),
            cfg,
        )
        assert float(res.cost) < 1e-2, float(res.cost)
        np.testing.assert_allclose(np.asarray(res.cam), cams, atol=5e-3)


class TestWindowParallel:
    def test_vmap_over_windows(self):
        import jax

        problems = []
        for seed in range(3):
            cams, pts, obs, mask = make_window(n_frames=4, n_pts=64, seed=seed)
            cams_p, pts_p = perturb(cams, pts, seed=seed + 50)
            problems.append(
                BAProblem(jnp.asarray(cams_p), jnp.asarray(pts_p),
                          jnp.asarray(obs), jnp.asarray(mask))
            )
        batch = jax.tree.map(lambda *x: jnp.stack(x), *problems)
        cfg = BAConfig(intr=INTR, baseline=BASELINE)
        res = jax.vmap(lambda p: ba_solve(p, cfg))(batch)
        assert res.cam.shape == (3, 4, 6)
        assert (np.asarray(res.cost) < 1e-2).all(), np.asarray(res.cost)
