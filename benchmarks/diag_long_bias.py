"""Signed per-motion error statistics over the 500-frame run: does the BA
chain carry a systematic rotation bias that accumulates where VO's random
walk does not? Caches rendered frames under /tmp. Debug tool for the
round-4 long-sequence gate.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_FRAMES = int(os.environ.get("BENCH_FRAMES", "501"))
WCHUNK = int(os.environ.get("BENCH_WCHUNK", "5"))
CACHE = Path(f"/tmp/long_frames_{N_FRAMES}.npz")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from uasl_motion_estimation_tpu.models.pipeline import default_config
    from uasl_motion_estimation_tpu.models.smoother import (
        SmootherConfig,
        compose_unified,
        unified_system_scan,
    )
    from uasl_motion_estimation_tpu.ops import lie
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
    if CACHE.exists():
        d = np.load(CACHE)
        ls_np, rs_np = d["ls"], d["rs"]
    else:
        frames = [seq.frame(i) for i in range(N_FRAMES)]
        ls_np = np.clip(np.stack([f[0] for f in frames]), 0, 255).astype(
            np.uint8)
        rs_np = np.clip(np.stack([f[1] for f in frames]), 0, 255).astype(
            np.uint8)
        np.savez(CACHE, ls=ls_np, rs=rs_np)
    gt_poses = seq.poses
    gt = seq.gt_positions()

    cfg = SmootherConfig(pipe=default_config(
        Intrinsics(rig.fu, rig.fv, rig.cu, rig.cv), rig.baseline
    ))
    ls, rs = jnp.asarray(ls_np), jnp.asarray(rs_np)
    out = jax.device_get(
        unified_system_scan(ls, rs, jax.random.key(0), cfg, wchunk=WCHUNK))
    np.savez(
        REPO / "benchmarks" / f"unified_dump_long{N_FRAMES}.npz",
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
    res = compose_unified(out, N_FRAMES, cfg)

    b = N_FRAMES - 1
    gt_m = np.stack([
        np.linalg.inv(gt_poses[j + 1]) @ gt_poses[j] for j in range(b)
    ])
    mv = res.per_frame[:, :16].reshape(b, 4, 4).astype(np.float64)
    # reconstruct installed BA motions from the trajectory chains
    mb = np.stack([
        np.linalg.inv(res.traj_ba[i + 1]) @ res.traj_ba[i] for i in range(b)
    ])

    def signed_rot_errs(ms):
        errs = np.zeros((b, 3))
        for i in range(b):
            dR = ms[i][:3, :3] @ gt_m[i][:3, :3].T
            errs[i] = np.asarray(lie.so3_log(jnp.asarray(dR, jnp.float32)))
        return errs

    ev, eb = signed_rot_errs(mv), signed_rot_errs(mb)
    tv = np.stack([mv[i][:3, 3] - gt_m[i][:3, 3] for i in range(b)])
    tb = np.stack([mb[i][:3, 3] - gt_m[i][:3, 3] for i in range(b)])
    for name, e, t in (("VO", ev, tv), ("BA", eb, tb)):
        print(f"{name}: rot mean [{e[:,0].mean()*1e3:+.2f} "
              f"{e[:,1].mean()*1e3:+.2f} {e[:,2].mean()*1e3:+.2f}] mdeg*, "
              f"std [{e[:,0].std()*1e3:.1f} {e[:,1].std()*1e3:.1f} "
              f"{e[:,2].std()*1e3:.1f}]  (mrad x1000? no: rad*1e3 = mrad)")
        print(f"    trans mean [{t[:,0].mean()*1e3:+.2f} "
              f"{t[:,1].mean()*1e3:+.2f} {t[:,2].mean()*1e3:+.2f}] mm, "
              f"std [{t[:,0].std()*1e3:.1f} {t[:,1].std()*1e3:.1f} "
              f"{t[:,2].std()*1e3:.1f}]")
    for n in (40, 100, 250, N_FRAMES):
        av = ate_rmse(res.traj_vo[:n, :3, 3], gt[:n])
        ab = ate_rmse(res.traj_ba[:n, :3, 3], gt[:n])
        print(f"horizon {n:4d}: ate_vo={av:.4f} ate_ba={ab:.4f}")


if __name__ == "__main__":
    main()
