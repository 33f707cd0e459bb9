"""Measure window-track observation error against EXACT GT geometry.

For each window track: true 3D point from the GT disparity at its birth
pixel, reprojected through GT motions to every window frame; compare with
the KLT/ZNCC-tracked observation. Separates (a) per-track drift magnitude,
(b) correlated drift (mean residual vector per frame — what actually biases
BA cameras), and (c) stereo-match disparity error per frame. Debug tool for
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
    )
    from uasl_motion_estimation_tpu.ops.geometry import Intrinsics
    from uasl_motion_estimation_tpu.utils.synthetic import (
        CameraRig,
        CorruptionConfig,
        SyntheticStereoSequence,
    )

    rig = CameraRig()
    seq = SyntheticStereoSequence(
        n_frames=WIN_START + 6, rig=rig, seed=0,
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
    obs, mask = jax.jit(
        lambda a, b, s: _build_window_tracks(a, b, s, cfg)
    )(lf, rf, jnp.zeros((1,), jnp.int32))
    obs = np.asarray(obs[0])  # (W, M, 4)
    mask = np.asarray(mask[0])  # (W, M)

    # exact GT 3D points for birth observations via GT disparity map
    gtd = seq.gt_disparity(WIN_START)  # (H, W) disparity of left frame
    u0, v0 = obs[0, :, 0], obs[0, :, 1]
    ui = np.clip(np.round(u0).astype(int), 0, rig.width - 1)
    vi = np.clip(np.round(v0).astype(int), 0, rig.height - 1)
    d_true = gtd[vi, ui]
    ok = mask[0] & (d_true > 0.1)
    z0 = rig.fu * rig.baseline / np.maximum(d_true, 1e-6)
    X = np.stack([(u0 - rig.cu) * z0 / rig.fu,
                  (v0 - rig.cv) * z0 / rig.fv, z0], axis=1)  # frame-0 cam

    keep_all = mask.all(axis=0) & ok  # survive whole window, valid GT depth
    print(f"corrupt={CORRUPT} window={WIN_START} tracks full-window: "
          f"{keep_all.sum()}")

    for j in range(W):
        T = (np.linalg.inv(gt_poses[WIN_START + j]) @ gt_poses[WIN_START])
        pc = X[keep_all] @ T[:3, :3].T + T[:3, 3]
        ul = rig.fu * pc[:, 0] / pc[:, 2] + rig.cu
        vl = rig.fv * pc[:, 1] / pc[:, 2] + rig.cv
        ur = rig.fu * (pc[:, 0] - rig.baseline) / pc[:, 2] + rig.cu
        o = obs[j][keep_all]
        dxl, dyl = o[:, 0] - ul, o[:, 1] - vl
        dd = (o[:, 0] - o[:, 2]) - (ul - ur)  # disparity error
        err = np.hypot(dxl, dyl)
        print(
            f"  f{j}: |dL| med={np.median(err):.3f} p90="
            f"{np.percentile(err, 90):.3f} | MEAN dx={dxl.mean():+.3f} "
            f"dy={dyl.mean():+.3f} (std {dxl.std():.2f},{dyl.std():.2f}) "
            f"| disp err med={np.median(np.abs(dd)):.3f} "
            f"mean={dd.mean():+.3f}"
        )


if __name__ == "__main__":
    main()
