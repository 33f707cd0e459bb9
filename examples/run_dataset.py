"""Run stereo odometry on an on-disk dataset described by a reference-format
YML config (same schema the C++ library consumes; utils/io.py).

    python examples/run_dataset.py config.yml [out_dir]

The dataset directory must use one of the supported layouts
(KITTI L_/R_*.png or cam{N}_image{NNNNN}.png). Uses the native async frame
loader when built, the pure-Python reader otherwise.
"""

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
from uasl_motion_estimation_tpu.utils import io as uio, viz
from uasl_motion_estimation_tpu.utils.checkpoint import checkpoint_every
from uasl_motion_estimation_tpu.utils.metrics import MetricsLogger

cfg_path = sys.argv[1]
out_dir = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("/tmp/vo_run")
out_dir.mkdir(parents=True, exist_ok=True)

session = uio.load_yml(cfg_path)
cal = session.calib
intr = Intrinsics(cal.fu1, cal.fv1, cal.cu1, cal.cv1)

system = OdometrySystem(
    OdometryConfig(
        vo=StereoVOParams(
            intr1=intr,
            intr2=Intrinsics(cal.fu2, cal.fv2, cal.cu2, cal.cv2),
            baseline=cal.baseline,
            inlier_threshold=cal.inlier_threshold,
            use_lm=(cal.method == "LM"),
            ransac=cal.ransac,
        ),
        max_tracks=session.tracking.nb_feats,
        window=session.tracking.window_size,
        ba_rate=session.tracking.ba_rate,
        # TrackingInfo.parallax drives the keyframe gate (file_IO.h:73)
        parallax=session.tracking.parallax,
        n_fixed=cal.nb_fixed_frames,
        matcher=MatcherConfig(),
    ),
    logger=MetricsLogger(path=str(out_dir / "metrics.jsonl")),
)

controller = uio.RunController(str(out_dir / "control"))

try:
    from uasl_motion_estimation_tpu.native import AsyncFrameLoader

    frames = (
        (l, r) for _, l, r in AsyncFrameLoader(
            session.dataset.dir, start=session.frames.start,
            stop=session.frames.stop, skip=session.frames.skip,
            appendix=session.appendix,
        )
    )
except Exception:
    frames = uio.ImageSequenceReader(
        session.dataset.dir, session.frames, appendix=session.appendix
    )

for left, right in frames:
    if not controller.checkpoint():
        print("stopped by controller")
        break
    system.process_pair(left, right)
    checkpoint_every(system, str(out_dir / "ckpt"), every=100)

traj = np.asarray(system.trajectory)
np.savetxt(out_dir / "trajectory.txt", traj[:, :3, :].reshape(len(traj), 12))
viz.plot_trajectories({"estimate": traj}, path=str(out_dir / "trajectory.png"))
print(f"{len(traj)} poses -> {out_dir}/trajectory.txt, trajectory.png")
