"""Deep-dive one bad window (frames 16-20 at bench scale): per-frame
reprojection cost of the refined vs VO-init solution on the gated tracks,
depth/spatial distribution of the tracks observed at the tail frames, and
the same window re-solved on the CLEAN world — separates outlier
contamination from observability degeneracy. Debug tool for VERDICT r3
item 1, not a committed benchmark.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WIN_START = int(os.environ.get("WIN_START", "16"))
CORRUPT = os.environ.get("CLEAN", "") == ""


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from uasl_motion_estimation_tpu.models.pipeline import default_config
    from uasl_motion_estimation_tpu.models.smoother import (
        SmootherConfig,
        _build_window_tracks,
        _cam6_from_T,
        _init_window_problem,
        _T_from_cam6,
        _inv_se3,
    )
    from uasl_motion_estimation_tpu.solvers.ba import (
        BAConfig,
        ba_solve,
        _residuals_jacobians,
        _robust_cost,
    )
    from uasl_motion_estimation_tpu.ops.geometry import Intrinsics
    from uasl_motion_estimation_tpu.utils.synthetic import (
        CameraRig,
        CorruptionConfig,
        SyntheticStereoSequence,
    )

    rig = CameraRig()
    n_frames = WIN_START + 6
    seq = SyntheticStereoSequence(
        n_frames=n_frames, rig=rig, seed=0,
        corruption=CorruptionConfig() if CORRUPT else None,
    )
    gt_poses = seq.poses

    pipe_cfg = default_config(
        Intrinsics(rig.fu, rig.fv, rig.cu, rig.cv), rig.baseline
    )
    cfg = SmootherConfig(pipe=pipe_cfg)
    W = cfg.window

    frames = [seq.frame(i) for i in range(WIN_START, WIN_START + W)]
    lf = jnp.asarray(np.stack([f[0] for f in frames]), jnp.float32)
    rf = jnp.asarray(np.stack([f[1] for f in frames]), jnp.float32)
    starts = jnp.zeros((1,), jnp.int32)

    obs, mask = jax.jit(
        lambda a, b, s: _build_window_tracks(a, b, s, cfg)
    )(lf, rf, starts)
    obs, mask = obs[0], mask[0]

    # GT motions for this window (world frame = window frame 0)
    gt_m = [
        np.linalg.inv(gt_poses[WIN_START + j + 1]) @ gt_poses[WIN_START + j]
        for j in range(W - 1)
    ]
    # init from GT motions (to isolate: does BA *leave* a GT init?)
    motions_gt = jnp.asarray(np.stack(gt_m), jnp.float32)
    # init from VO would need the VO chain; use GT-perturbed instead for probe
    prob = jax.jit(
        lambda m, s, o, k: _init_window_problem(m, s, o, k, cfg)
    )(motions_gt, jnp.asarray(0, jnp.int32), obs, mask)

    ba_cfg = BAConfig(
        intr=pipe_cfg.vo.intr1, baseline=float(pipe_cfg.vo.baseline),
        n_fixed=cfg.n_fixed, max_iter=cfg.ba_max_iter,
        huber_delta=cfg.huber_delta,
    )
    res = jax.jit(lambda p: ba_solve(p, ba_cfg))(prob)

    maskf = np.asarray(prob.mask)
    print(f"corrupt={CORRUPT} window start={WIN_START}")
    print("per-frame gated obs:", maskf.sum(1))

    def per_frame_cost(cam, pts):
        r, _, _ = _residuals_jacobians(
            jnp.asarray(cam), jnp.asarray(pts), prob.obs, ba_cfg)
        r = np.asarray(r)
        out = []
        for j in range(W):
            m = maskf[j]
            if m.sum() == 0:
                out.append(0.0)
                continue
            nrm = np.sqrt((r[j] ** 2).sum(-1))[m]
            out.append(float(np.median(nrm)))
        return out

    print("median |r| per frame, GT-chained init :",
          np.round(per_frame_cost(prob.cam, prob.pts), 3))
    print("median |r| per frame, BA-refined      :",
          np.round(per_frame_cost(res.cam, res.pts), 3))

    # refined motions vs GT
    Ts = [np.asarray(_T_from_cam6(res.cam[j]), np.float64) for j in range(W)]
    for j in range(W - 1):
        m_ref = Ts[j + 1] @ np.linalg.inv(Ts[j])
        dt = np.linalg.norm(m_ref[:3, 3] - gt_m[j][:3, 3]) * 1e3
        Rr = m_ref[:3, :3].T @ gt_m[j][:3, :3]
        ang = np.degrees(np.arccos(np.clip((np.trace(Rr) - 1) / 2, -1, 1)))
        print(f"  refined motion {j}: dt={dt:.2f} mm  dR={ang*1e3:.1f} mdeg")

    # tail-frame track geometry: depth + image spread of tracks alive at j=W-1
    tail = maskf[W - 1]
    pts0 = np.asarray(prob.pts)
    print(f"tail tracks: {tail.sum()}")
    if tail.sum():
        z = pts0[tail][:, 2]
        uv = np.asarray(obs)[W - 1][tail][:, :2]
        disp = np.asarray(obs)[W - 1][tail][:, 0] - np.asarray(obs)[W - 1][tail][:, 2]
        print(f"  depth: median={np.median(z):.1f} p10={np.percentile(z,10):.1f} "
              f"p90={np.percentile(z,90):.1f} m")
        print(f"  disparity: median={np.median(disp):.2f} px  "
              f"min={disp.min():.2f}")
        print(f"  u spread: {uv[:,0].min():.0f}..{uv[:,0].max():.0f}  "
              f"v spread: {uv[:,1].min():.0f}..{uv[:,1].max():.0f}")
        print(f"  u std={uv[:,0].std():.1f} v std={uv[:,1].std():.1f}")


if __name__ == "__main__":
    main()
