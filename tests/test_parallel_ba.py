"""Cross-device window-parallel BA with halo exchange (VERDICT r1 item 8 /
SURVEY section 2.3): overlapping windows sharded over the simulated CPU mesh
must converge to a consistent pose chain — the reference's fixedFrames
anchoring (BundleAdjuster.h:406-407,452-453) as the consistency mechanism."""

import jax
import jax.numpy as jnp
import numpy as np

from uasl_motion_estimation_tpu import parallel
from uasl_motion_estimation_tpu.ops import geometry as geo, lie
from uasl_motion_estimation_tpu.parallel.ba_windows import (
    shard_windows,
    window_parallel_ba,
)
from uasl_motion_estimation_tpu.solvers.ba import BAConfig, BAProblem

INTR = geo.Intrinsics(fu=400.0, fv=400.0, cu=320.0, cv=240.0)
BASELINE = 0.5


def make_sequence(n_frames, n_pts=100, noise=0.0, seed=0):
    """Ground-truth forward-motion sequence with exact stereo projections."""
    rng = np.random.default_rng(seed)
    cams = []
    for i in range(n_frames):
        aa = np.array([0.002 * i, 0.004 * i, 0.001 * i])
        t = np.array([0.05 * i, 0.02 * i, -0.8 * i])
        cams.append(np.concatenate([aa, t]))
    cams = np.asarray(cams, np.float32)
    pts = np.stack(
        [rng.uniform(-10, 10, n_pts), rng.uniform(-3, 3, n_pts),
         rng.uniform(8, 45, n_pts)], -1
    ).astype(np.float32)
    obs = np.zeros((n_frames, n_pts, 4), np.float32)
    mask = np.zeros((n_frames, n_pts), bool)
    for w, cam in enumerate(cams):
        Rm = np.asarray(lie.so3_exp(jnp.asarray(cam[:3])))
        pc = pts @ Rm.T + cam[3:6]
        z = pc[:, 2]
        ul = INTR.fu * pc[:, 0] / z + INTR.cu
        v = INTR.fv * pc[:, 1] / z + INTR.cv
        ur = INTR.fu * (pc[:, 0] - BASELINE) / z + INTR.cu
        obs[w] = np.stack([ul, v, ur, v], -1)
        mask[w] = (z > 1.0) & (ul > 0) & (ul < 640) & (v > 0) & (v < 480)
    obs += rng.normal(scale=noise, size=obs.shape).astype(np.float32)
    return cams, pts, obs, mask


def build_windows(cams, pts, obs, mask, window=6, overlap=2):
    """Overlapping windows: stride = window - overlap."""
    stride = window - overlap
    n = len(cams)
    starts = list(range(0, n - window + 1, stride))
    wc = np.stack([cams[s:s + window] for s in starts])
    wo = np.stack([obs[s:s + window] for s in starts])
    wm = np.stack([mask[s:s + window] for s in starts])
    wp = np.stack([pts] * len(starts))
    return starts, BAProblem(jnp.asarray(wc), jnp.asarray(wp),
                             jnp.asarray(wo), jnp.asarray(wm))


class TestWindowParallelBA:
    def test_halo_exchange_consistent_chain(self):
        """4 overlapping windows over a 2-device mesh: after sweeps, each
        boundary's shared frames agree between the two windows and the chain
        re-converges to ground truth from a perturbed init."""
        window, overlap = 6, 2
        cams, pts, obs, mask = make_sequence(18, noise=0.1, seed=1)
        starts, prob = build_windows(cams, pts, obs, mask, window, overlap)
        assert len(starts) == 4

        rng = np.random.default_rng(5)
        wc = np.asarray(prob.cam)
        # perturb every non-anchor frame; window 0's head stays exact (gauge)
        wc_p = wc + rng.normal(scale=0.01, size=wc.shape).astype(np.float32)
        wc_p[0, :overlap] = wc[0, :overlap]
        wp_p = np.asarray(prob.pts) + rng.normal(
            scale=0.3, size=prob.pts.shape
        ).astype(np.float32)
        prob_p = BAProblem(jnp.asarray(wc_p), jnp.asarray(wp_p), prob.obs,
                           prob.mask)

        mesh = parallel.make_mesh(2)
        cfg = BAConfig(intr=INTR, baseline=BASELINE, n_fixed=overlap)
        res = window_parallel_ba(shard_windows(prob_p, mesh), cfg, mesh,
                                 n_sweeps=3)
        out = np.asarray(res.cam)  # (4, 6, 6)

        # boundary consistency: window i's tail == window i+1's fixed head
        for i in range(3):
            np.testing.assert_allclose(
                out[i, -overlap:], out[i + 1, :overlap], atol=5e-4,
                err_msg=f"boundary {i} inconsistent",
            )
        # chain accuracy: stitched trajectory matches ground truth
        for i, s in enumerate(starts):
            np.testing.assert_allclose(
                out[i], cams[s:s + window], atol=5e-3,
                err_msg=f"window {i} diverged",
            )

    def test_uncoupled_windows_drift_apart(self):
        """Sanity: WITHOUT halo exchange (n_sweeps solves with no exchange =
        plain vmap), perturbed anchors leave the boundaries inconsistent —
        the exchange is what produces agreement."""
        from uasl_motion_estimation_tpu.solvers.ba import ba_solve

        window, overlap = 6, 2
        cams, pts, obs, mask = make_sequence(18, noise=0.1, seed=2)
        starts, prob = build_windows(cams, pts, obs, mask, window, overlap)
        rng = np.random.default_rng(6)
        wc_p = np.asarray(prob.cam) + rng.normal(
            scale=0.01, size=prob.cam.shape
        ).astype(np.float32)
        wc_p[0, :overlap] = np.asarray(prob.cam)[0, :overlap]
        prob_p = BAProblem(jnp.asarray(wc_p), prob.pts, prob.obs, prob.mask)
        cfg = BAConfig(intr=INTR, baseline=BASELINE, n_fixed=overlap)
        res = jax.vmap(lambda c, p, o, m: ba_solve(BAProblem(c, p, o, m), cfg)
                       )(prob_p.cam, prob_p.pts, prob_p.obs, prob_p.mask)
        out = np.asarray(res.cam)
        worst = max(
            np.abs(out[i, -overlap:] - out[i + 1, :overlap]).max()
            for i in range(len(starts) - 1)
        )
        assert worst > 2e-3, f"expected inconsistency, got {worst}"
