"""Exact full-system reproduction of one bad window + ablations.

Replays the full_system_scan path (VO scan -> window tracks -> VO-init
problem -> gated batched BA) for a chosen window at bench scale, then
ablates: (a) remove tracks whose birth pixel lies on a moving quad /
occluder, (b) init from GT motions, (c) gate vs GT cams. Debug tool for
VERDICT r3 item 1.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WIN_START = int(os.environ.get("WIN_START", "16"))
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "40"))
CHUNK = 13
TRACK_MODE = os.environ.get("TRACK_MODE", "chain")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from uasl_motion_estimation_tpu.models.pipeline import default_config
    from uasl_motion_estimation_tpu.models.smoother import (
        SmootherConfig,
        _build_window_tracks,
        _init_window_problem,
        _T_from_cam6,
    )
    from uasl_motion_estimation_tpu.models.pipeline import _vo_scan_packed
    from uasl_motion_estimation_tpu.solvers.ba import (
        BAConfig,
        BAProblem,
        ba_solve,
    )
    from uasl_motion_estimation_tpu.ops.geometry import Intrinsics
    from uasl_motion_estimation_tpu.utils.synthetic import (
        CameraRig,
        CorruptionConfig,
        SyntheticStereoSequence,
    )

    rig = CameraRig()
    seq = SyntheticStereoSequence(
        n_frames=N_FRAMES, rig=rig, seed=0, corruption=CorruptionConfig()
    )
    frames = [seq.frame(i) for i in range(N_FRAMES)]
    gt_poses = seq.poses

    pipe_cfg = default_config(
        Intrinsics(rig.fu, rig.fv, rig.cu, rig.cv), rig.baseline
    )
    cfg = SmootherConfig(pipe=pipe_cfg)._replace(track_mode=TRACK_MODE)
    W = cfg.window

    ls = jnp.asarray(
        np.clip(np.stack([f[0] for f in frames]), 0, 255).astype(np.uint8))
    rs = jnp.asarray(
        np.clip(np.stack([f[1] for f in frames]), 0, 255).astype(np.uint8))
    b = N_FRAMES - 1
    g = -(-b // CHUNK)
    keys = jax.random.split(jax.random.key(0), g * CHUNK)
    packed = np.asarray(_vo_scan_packed(ls, rs, keys, pipe_cfg, CHUNK))[:b]
    motions_vo = packed[:, :16].reshape(b, 4, 4).copy()
    success = packed[:, 16] > 0.5
    motions_vo[~success] = np.eye(4, dtype=np.float32)
    motions_vo = jnp.asarray(motions_vo, jnp.float32)

    lf, rf = ls.astype(jnp.float32), rs.astype(jnp.float32)
    starts = jnp.asarray([WIN_START], jnp.int32)
    obs, mask = jax.jit(
        lambda a, b_, s: _build_window_tracks(a, b_, s, cfg)
    )(lf, rf, starts)
    obs, mask = obs[0], mask[0]

    gt_m = np.stack([
        np.linalg.inv(gt_poses[j + 1]) @ gt_poses[j] for j in range(b)
    ]).astype(np.float32)

    ba_cfg = BAConfig(
        intr=pipe_cfg.vo.intr1, baseline=float(pipe_cfg.vo.baseline),
        n_fixed=cfg.n_fixed, max_iter=cfg.ba_max_iter,
        huber_delta=cfg.huber_delta,
    )

    # classify birth pixels: on a moving quad / occluder?
    T_w2c = np.linalg.inv(gt_poses[WIN_START])
    on_quad = np.zeros(obs.shape[1], bool)
    u0 = np.asarray(obs[0, :, 0:2])
    gtd = seq.gt_disparity(WIN_START)
    for q in seq.quads:
        center = q.point0 + WIN_START * q.velocity
        # project quad corners
        cs = []
        for su in (-1, 1):
            for sv in (-1, 1):
                p = center + su * q.half_u * q.u_axis + sv * q.half_v * q.v_axis
                pc = T_w2c[:3, :3] @ p + T_w2c[:3, 3]
                if pc[2] > 0.1:
                    cs.append([rig.fu * pc[0] / pc[2] + rig.cu,
                               rig.fv * pc[1] / pc[2] + rig.cv])
        if len(cs) == 4:
            cs = np.array(cs)
            inside = ((u0[:, 0] >= cs[:, 0].min()) & (u0[:, 0] <= cs[:, 0].max())
                      & (u0[:, 1] >= cs[:, 1].min()) & (u0[:, 1] <= cs[:, 1].max()))
            on_quad |= inside
    print(f"window {WIN_START}: {on_quad.sum()} birth features in "
          f"moving-quad/occluder boxes (of {int(np.asarray(mask[0]).sum())} valid)")

    def report(tag, prob):
        res = jax.jit(lambda p: ba_solve(p, ba_cfg))(prob)
        Ts = [np.asarray(_T_from_cam6(res.cam[j]), np.float64) for j in range(W)]
        m = np.asarray(prob.mask)
        line = []
        for j in range(W - 1):
            m_ref = Ts[j + 1] @ np.linalg.inv(Ts[j])
            gm = gt_m[WIN_START + j].astype(np.float64)
            dt = np.linalg.norm(m_ref[:3, 3] - gm[:3, 3]) * 1e3
            Rr = m_ref[:3, :3].T @ gm[:3, :3]
            ang = np.degrees(np.arccos(np.clip((np.trace(Rr) - 1) / 2, -1, 1)))
            line.append(f"m{j}: {dt:6.2f}mm {ang*1e3:7.1f}mdeg")
        print(f"{tag:28s} obs/frame={m.sum(1)} iter={int(res.n_iter)} "
              f"cost={float(res.cost):.3f}")
        print(f"{'':28s} " + " | ".join(line))

    # (0) exact full-system path: VO init + VO gate
    prob = jax.jit(
        lambda m, s, o, k: _init_window_problem(m, s, o, k, cfg)
    )(motions_vo, jnp.asarray(WIN_START, jnp.int32), obs, mask)
    report("VO-init, VO-gate", prob)

    # (a) drop on-quad tracks
    keepq = jnp.asarray(~on_quad)
    prob_a = BAProblem(cam=prob.cam, pts=prob.pts, obs=prob.obs,
                       mask=prob.mask & keepq[None, :])
    report("VO-init, VO-gate, -quads", prob_a)

    # (b) GT init (gate still via _init_window_problem on GT motions)
    prob_b = jax.jit(
        lambda m, s, o, k: _init_window_problem(m, s, o, k, cfg)
    )(jnp.asarray(gt_m), jnp.asarray(WIN_START, jnp.int32), obs, mask)
    report("GT-init, GT-gate", prob_b)

    # (c) GT init, minus quads
    prob_c = BAProblem(cam=prob_b.cam, pts=prob_b.pts, obs=prob_b.obs,
                       mask=prob_b.mask & keepq[None, :])
    report("GT-init, GT-gate, -quads", prob_c)


if __name__ == "__main__":
    main()
