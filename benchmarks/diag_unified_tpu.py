"""TPU probe: unified track-table engine at the bench config (KITTI-size
corrupted world) — fps + ATE vs the two-stage engine's committed numbers.
Debug/validation tool for the round-4 unified engine.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_FRAMES = int(os.environ.get("BENCH_FRAMES", "40"))
WCHUNK = int(os.environ.get("BENCH_WCHUNK", "5"))
REPS = int(os.environ.get("BENCH_REPS", "3"))


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
    gt = seq.gt_positions()

    cfg = SmootherConfig(pipe=default_config(
        Intrinsics(rig.fu, rig.fv, rig.cu, rig.cv), rig.baseline
    ))._replace(ba_rate=int(os.environ.get("BA_RATE", "4")))

    ls = jnp.asarray(
        np.clip(np.stack([f[0] for f in frames]), 0, 255).astype(np.uint8))
    rs = jnp.asarray(
        np.clip(np.stack([f[1] for f in frames]), 0, 255).astype(np.uint8))
    key = jax.random.key(0)

    t0 = time.perf_counter()
    out = jax.device_get(unified_system_scan(ls, rs, key, cfg, wchunk=WCHUNK))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s")
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = jax.device_get(
            unified_system_scan(ls, rs, key, cfg, wchunk=WCHUNK))
        times.append(time.perf_counter() - t0)
    fps = (N_FRAMES - 1) / float(np.median(times))

    res = compose_unified(out, N_FRAMES, cfg)
    ate_vo = float(ate_rmse(res.traj_vo[:, :3, 3], gt))
    ate_ba = float(ate_rmse(res.traj_ba[:, :3, 3], gt))
    succ = res.per_frame[:, 16]
    print(f"fps={fps:.2f} ({[round(t,3) for t in times]})")
    print(f"ate_vo={ate_vo:.4f} ate_ba={ate_ba:.4f}")
    print(f"success={int(succ.sum())}/{len(succ)} "
          f"n_track_obs={np.asarray(out.n_track_obs)}")
    print(f"vs ref 12.93fps: {fps / 12.93:.2f}x")


if __name__ == "__main__":
    main()
