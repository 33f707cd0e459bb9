"""Diagnostic: per-motion VO-vs-BA error against exact GT on the unified
engine (originally built for the round-3 question "why does windowed BA
degrade ATE at the KITTI-size bench config"; root-caused and fixed round 4,
kept as the standing per-motion inspection tool — ported to the unified
track-table engine when the round-3 full_system_scan was removed).

Compares every window motion against exact GT: VO error vs refined error,
per-frame gated observation counts, per-window cost, and whether the
min_frame_obs install gate fires. Prints a per-motion table. Not a
committed benchmark — a debugging tool.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_FRAMES = int(os.environ.get("BENCH_FRAMES", "40"))
WCHUNK = int(os.environ.get("BENCH_WCHUNK", "4"))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from uasl_motion_estimation_tpu.models.pipeline import default_config
    from uasl_motion_estimation_tpu.models.smoother import (
        SmootherConfig,
        compose_unified,
        unified_system_scan,
        unified_window_starts,
    )
    from uasl_motion_estimation_tpu.ops.geometry import Intrinsics
    from uasl_motion_estimation_tpu.utils.metrics import ate_rmse
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
    gt_poses = seq.poses  # (N, 4, 4) cam-to-world
    gt = seq.gt_positions()

    pipe_cfg = default_config(
        Intrinsics(rig.fu, rig.fv, rig.cu, rig.cv), rig.baseline
    )
    cfg = SmootherConfig(pipe=pipe_cfg)._replace(
        track_mode=os.environ.get("TRACK_MODE", "chain"))

    ls = jax.numpy.asarray(
        np.clip(np.stack([f[0] for f in frames]), 0, 255).astype(np.uint8))
    rs = jax.numpy.asarray(
        np.clip(np.stack([f[1] for f in frames]), 0, 255).astype(np.uint8))
    out = jax.device_get(
        unified_system_scan(ls, rs, jax.random.key(0), cfg, wchunk=WCHUNK)
    )
    res = compose_unified(out, N_FRAMES, cfg)

    ate_vo = float(ate_rmse(res.traj_vo[:, :3, 3], gt))
    ate_ba = float(ate_rmse(res.traj_ba[:, :3, 3], gt))
    print(f"ate_vo={ate_vo:.4f}  ate_ba={ate_ba:.4f}")

    b = N_FRAMES - 1
    gt_motions = np.stack(
        [np.linalg.inv(gt_poses[j + 1]) @ gt_poses[j] for j in range(b)]
    )

    def rot_err_deg(A, B):
        R = A[:3, :3].T @ B[:3, :3]
        c = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
        return float(np.degrees(np.arccos(c)))

    starts = unified_window_starts(N_FRAMES, cfg.window, cfg.ba_rate)
    motions_vo = np.asarray(out.vo_motions, np.float64)
    refined = np.asarray(out.refined_motions, np.float64)
    n_frame_obs = np.asarray(out.n_frame_obs)
    print(f"windows at {starts}")
    print(f"ba_cost={np.asarray(out.ba_cost).round(3)}")
    print(f"converged={np.asarray(out.ba_converged)}")
    print(f"n_track_obs={np.asarray(out.n_track_obs)}")
    print("win mot  t_vo_mm  t_ba_mm  r_vo_mdeg r_ba_mdeg  obs_j obs_j1 installed")
    for i, s in enumerate(starts):
        for j in range(cfg.window - 1):
            m = s + j
            if m >= b:
                continue
            evo = np.linalg.norm(motions_vo[i, j, :3, 3] - gt_motions[m, :3, 3])
            eba = np.linalg.norm(refined[i, j, :3, 3] - gt_motions[m, :3, 3])
            rvo = rot_err_deg(motions_vo[i, j], gt_motions[m])
            rba = rot_err_deg(refined[i, j], gt_motions[m])
            inst = (n_frame_obs[i, j] >= cfg.min_frame_obs
                    and n_frame_obs[i, j + 1] >= cfg.min_frame_obs)
            flag = " <-- WORSE" if inst and eba > evo * 1.2 else ""
            print(f"{i:3d} {m:3d} {evo*1e3:8.2f} {eba*1e3:8.2f} "
                  f"{rvo*1e3:9.2f} {rba*1e3:9.2f} {n_frame_obs[i,j]:6d} "
                  f"{n_frame_obs[i,j+1]:6d} {str(inst):9s}{flag}")
    print("n_frame_obs per window:")
    for i, s in enumerate(starts):
        print(f"  w{i} start={s}: {n_frame_obs[i]}")


if __name__ == "__main__":
    main()
