"""End-to-end demo on the built-in synthetic world: stereo odometry with
windowed BA, metrics JSONL, and result plots. No dataset required.

    python examples/run_synthetic.py [n_frames] [out_dir]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from uasl_motion_estimation_tpu.models.frontend import MatcherConfig
from uasl_motion_estimation_tpu.models.odometry import (
    OdometryConfig,
    OdometrySystem,
)
from uasl_motion_estimation_tpu.models.stereo_vo import StereoVOParams
from uasl_motion_estimation_tpu.ops.geometry import Intrinsics
from uasl_motion_estimation_tpu.utils import viz
from uasl_motion_estimation_tpu.utils.metrics import MetricsLogger, ate_rmse, rpe
from uasl_motion_estimation_tpu.utils.synthetic import (
    CameraRig,
    SyntheticStereoSequence,
)

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 20
out_dir = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("/tmp/vo_demo")
out_dir.mkdir(parents=True, exist_ok=True)

rig = CameraRig(fu=320.0, fv=320.0, cu=160.0, cv=96.0, baseline=0.54,
                height=192, width=320)
seq = SyntheticStereoSequence(n_frames=n_frames, rig=rig, seed=4)
intr = Intrinsics(rig.fu, rig.fv, rig.cu, rig.cv)

metrics_path = out_dir / "metrics.jsonl"
with open(metrics_path, "w") as fh:
    logger = MetricsLogger(stream=fh)
    system = OdometrySystem(
        OdometryConfig(
            vo=StereoVOParams(intr1=intr, intr2=intr, baseline=rig.baseline),
            max_tracks=256, window=5, ba_rate=5,
            matcher=MatcherConfig(max_disparity=96),
        ),
        seed=0, logger=logger,
    )
    traj = system.run(seq.frame(i) for i in range(n_frames))

gt = seq.gt_positions()
print(f"ATE: {ate_rmse(traj[:, :3, 3], gt):.4f} m over "
      f"{np.linalg.norm(np.diff(gt, axis=0), axis=1).sum():.1f} m")
t_err, r_err = rpe(traj, seq.poses)
print(f"RPE: {t_err * 100:.2f} cm/frame, {np.degrees(r_err):.4f} deg/frame")

viz.plot_trajectories({"estimate": traj, "ground truth": gt},
                      path=str(out_dir / "trajectory.png"))
records = [json.loads(l) for l in open(metrics_path)]
viz.plot_metrics(records, path=str(out_dir / "metrics.png"))
print(f"wrote {out_dir}/trajectory.png, metrics.png, metrics.jsonl")
