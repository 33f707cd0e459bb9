"""Measure the reference library's CPU stereo-VO throughput and accuracy.

Runs the unmodified reference (core+vo compiled from /root/reference by
reference_baseline/build.sh) with its standard OpenCV consumer front-end on
the same synthetic KITTI-sized frames bench.py uses, at the library's
DEFAULT configuration (GN, 200 RANSAC iterations, max_iter=100 —
VisualOdometry.h:32). The result is cached in benchmarks/reference_cpu.json.

The reference has no early-exit that fires on realistically-noisy matches
(its e2/e3 tolerances are 1e-12, below attainable precision), so every
optimisation runs its full iteration budget and a frame takes minutes of CPU;
we therefore measure a small number of frames (per-frame cost is stable) with
a generous timeout. Run: python benchmarks/measure_reference.py [n_frames]
"""

import json
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 4
# default: the REPAIRED reference (see build.sh — the as-shipped binary has a
# broken optimisation-loop exit that spins for tens of minutes per frame;
# beating a spin loop is not a meaningful speedup, so the fair baseline fixes
# it). Pass --as-shipped to measure the library exactly as published.
AS_SHIPPED = "--as-shipped" in sys.argv
CACHE = REPO / "benchmarks" / (
    "reference_cpu_as_shipped.json" if AS_SHIPPED else "reference_cpu.json"
)


def main():
    import cv2

    from uasl_motion_estimation_tpu.utils.metrics import ate_rmse
    from uasl_motion_estimation_tpu.utils.synthetic import (
        CameraRig,
        SyntheticStereoSequence,
    )

    rig = CameraRig()
    seq = SyntheticStereoSequence(n_frames=N_FRAMES, rig=rig, seed=0)

    name = "ref_vo" if AS_SHIPPED else "ref_vo_repaired"
    bin_path = REPO / "benchmarks" / "reference_baseline" / name
    if not bin_path.exists():
        import os

        env = dict(os.environ, REPAIRED="0" if AS_SHIPPED else "1")
        subprocess.run(
            [str(REPO / "benchmarks" / "reference_baseline" / "build.sh")],
            check=True, capture_output=True, timeout=300, env=env,
        )

    with tempfile.TemporaryDirectory() as td:
        for i in range(N_FRAMES):
            l, r = seq.frame(i)
            cv2.imwrite(f"{td}/L_{i:06d}.png", np.clip(l, 0, 255).astype(np.uint8))
            cv2.imwrite(f"{td}/R_{i:06d}.png", np.clip(r, 0, 255).astype(np.uint8))
        out = subprocess.run(
            [str(bin_path), td, str(N_FRAMES), str(rig.fu), str(rig.fv),
             str(rig.cu), str(rig.cv), str(rig.baseline)],
            capture_output=True, text=True, timeout=3600 * 4, check=True,
        )
    summary = json.loads(out.stderr.strip().splitlines()[-1])
    rows = []
    for line in out.stdout.splitlines():
        parts = line.split()
        if len(parts) != 12:
            continue  # skip the library's "[Motion Estimation] ..." chatter
        try:
            rows.append([float(v) for v in parts])
        except ValueError:
            continue
    poses = np.array(rows).reshape(-1, 3, 4)
    ate = float(ate_rmse(poses[:, :3, 3], seq.gt_positions()))
    rec = {
        "fps": summary["fps"],
        "ate": ate,
        "ok_frames": summary["ok_frames"],
        "n_frames": N_FRAMES,
        "config": (
            "reference defaults: GN, n_ransac=200, max_iter=100"
            + ("" if AS_SHIPPED else
               "; optimisation-loop exit repaired (see build.sh)")
        ),
        "hardware": "container CPU (single thread, -O3 -march=native)",
    }
    CACHE.write_text(json.dumps(rec, indent=1))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
