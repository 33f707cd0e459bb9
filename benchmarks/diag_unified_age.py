"""Per-motion error vs WINDOW AGE for the unified engine at bench scale.

Chained-KLT drift grows with a track's age; in the unified engine every
motion is solved (VO) and refined (BA) at a fixed age j = global_index mod
ba_rate inside its owning window. If BA's error grows with age while VO's
stays flat, BA should only install young motions. Debug tool for the
round-4 unified engine.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_FRAMES = int(os.environ.get("BENCH_FRAMES", "40"))
SEED = int(os.environ.get("WORLD_SEED", "0"))
WCHUNK = int(os.environ.get("BENCH_WCHUNK", "5"))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from uasl_motion_estimation_tpu.models.pipeline import default_config
    from uasl_motion_estimation_tpu.models.smoother import (
        SmootherConfig,
        unified_system_scan,
        unified_window_starts,
    )
    from uasl_motion_estimation_tpu.ops.geometry import Intrinsics
    from uasl_motion_estimation_tpu.utils.synthetic import (
        CameraRig,
        CorruptionConfig,
        SyntheticStereoSequence,
    )

    rig = CameraRig()
    seq = SyntheticStereoSequence(
        n_frames=N_FRAMES, rig=rig, seed=SEED, corruption=CorruptionConfig()
    )
    frames = [seq.frame(i) for i in range(N_FRAMES)]
    gt_poses = seq.poses

    cfg = SmootherConfig(pipe=default_config(
        Intrinsics(rig.fu, rig.fv, rig.cu, rig.cv), rig.baseline
    ))._replace(ba_rate=int(os.environ.get("BA_RATE", "4")))
    W = cfg.window

    ls = jnp.asarray(
        np.clip(np.stack([f[0] for f in frames]), 0, 255).astype(np.uint8))
    rs = jnp.asarray(
        np.clip(np.stack([f[1] for f in frames]), 0, 255).astype(np.uint8))
    out = jax.device_get(
        unified_system_scan(ls, rs, jax.random.key(0), cfg, wchunk=WCHUNK))
    np.savez(
        REPO / "benchmarks" / f"unified_dump_stride{cfg.ba_rate}_s{SEED}.npz",
        vo_motions=np.asarray(out.vo_motions),
        vo_success=np.asarray(out.vo_success),
        vo_n_matches=np.asarray(out.vo_n_matches),
        vo_n_inliers=np.asarray(out.vo_n_inliers),
        vo_err=np.asarray(out.vo_err),
        refined=np.asarray(out.refined_motions),
        nfo=np.asarray(out.n_frame_obs),
        ba_cost=np.asarray(out.ba_cost),
        gt_poses=gt_poses,
    )

    b = N_FRAMES - 1
    gt_m = np.stack([
        np.linalg.inv(gt_poses[j + 1]) @ gt_poses[j] for j in range(b)
    ])
    starts = unified_window_starts(N_FRAMES, W, cfg.ba_rate)
    vo_m = np.asarray(out.vo_motions, np.float64)
    ref_m = np.asarray(out.refined_motions, np.float64)
    nfo = np.asarray(out.n_frame_obs)

    def rerr(A, B):
        R = A[:3, :3].T @ B[:3, :3]
        c = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
        return np.degrees(np.arccos(c)) * 1e3

    by_age = {j: {"vo_t": [], "ba_t": [], "vo_r": [], "ba_r": []}
              for j in range(W - 1)}
    print("win mot age  t_vo_mm  t_ba_mm  r_vo_mdeg r_ba_mdeg  obs_j obs_j1")
    for i, s in enumerate(starts):
        for j in range(W - 1):
            m = s + j
            if m >= b:
                continue
            evo = np.linalg.norm(vo_m[i, j, :3, 3] - gt_m[m, :3, 3]) * 1e3
            eba = np.linalg.norm(ref_m[i, j, :3, 3] - gt_m[m, :3, 3]) * 1e3
            rvo, rba = rerr(vo_m[i, j], gt_m[m]), rerr(ref_m[i, j], gt_m[m])
            by_age[j]["vo_t"].append(evo)
            by_age[j]["ba_t"].append(eba)
            by_age[j]["vo_r"].append(rvo)
            by_age[j]["ba_r"].append(rba)
            print(f"{i:3d} {m:3d} {j:3d} {evo:8.2f} {eba:8.2f} "
                  f"{rvo:9.1f} {rba:9.1f} {nfo[i,j]:6d} {nfo[i,j+1]:6d}")
    print("\nage  median t_vo  t_ba   r_vo   r_ba   (mm / mdeg)")
    for j in range(W - 1):
        d = by_age[j]
        print(f"{j:3d}  {np.median(d['vo_t']):8.2f} "
              f"{np.median(d['ba_t']):6.2f} {np.median(d['vo_r']):6.1f} "
              f"{np.median(d['ba_r']):6.1f}")


if __name__ == "__main__":
    main()
