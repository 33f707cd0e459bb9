"""Headline benchmark: stereo-VO frames/s/chip vs the reference CPU library.

Renders a KITTI-sized synthetic stereo sequence (376x1241, exact ground
truth — no datasets ship in this environment), then:
  1. runs the TPU pipeline end-to-end (front-end + vmapped-RANSAC GN pose),
     timing steady-state frames/s (jit compile excluded);
  2. runs the ACTUAL reference library (core+vo compiled unmodified from
     /root/reference by benchmarks/reference_baseline/build.sh) with its
     standard OpenCV consumer front-end on the same frames;
  3. checks both trajectories against ground truth (ATE) and prints ONE
     JSON line with frames/s/chip and the speedup vs the reference CPU
     baseline.

The reference publishes no numbers (BASELINE.md), so the measured CPU run is
the operative baseline; it is cached in benchmarks/reference_cpu.json and
re-measured whenever the binary can be (re)built.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

N_FRAMES = int(os.environ.get("BENCH_FRAMES", "40"))
WARMUP = 3
CACHE = REPO / "benchmarks" / "reference_cpu.json"


def render_sequence():
    from uasl_motion_estimation_tpu.utils.synthetic import (
        CameraRig,
        SyntheticStereoSequence,
    )

    rig = CameraRig()  # KITTI-like: 376x1241, fu 718.856, baseline 0.5372
    seq = SyntheticStereoSequence(n_frames=N_FRAMES, rig=rig, seed=0)
    frames = [seq.frame(i) for i in range(N_FRAMES)]
    return rig, seq, frames


def run_tpu(rig, seq, frames):
    import jax

    # persistent compilation cache: a cold KITTI-shape compile through the
    # TPU tunnel takes minutes; cached recompiles are seconds
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from uasl_motion_estimation_tpu.models.pipeline import (
        OdometryPipeline,
        default_config,
    )
    from uasl_motion_estimation_tpu.ops.geometry import Intrinsics
    from uasl_motion_estimation_tpu.utils.metrics import ate_rmse

    cfg = default_config(
        Intrinsics(rig.fu, rig.fv, rig.cu, rig.cv), rig.baseline
    )
    chunk = int(os.environ.get("BENCH_CHUNK", "8"))
    # warmup compiles the single-dispatch sequence step
    warm = OdometryPipeline(cfg, seed=0)
    warm.run_sequence(frames, chunk=chunk)
    pipe = OdometryPipeline(cfg, seed=0)
    t0 = time.perf_counter()
    traj = pipe.run_sequence(frames, chunk=chunk)
    dt = time.perf_counter() - t0
    fps = (N_FRAMES - 1) / dt
    ate = ate_rmse(traj[:, :3, 3], seq.gt_positions())
    return fps, ate


def run_reference():
    """Reference CPU baseline: the cached measurement from
    benchmarks/measure_reference.py (the reference takes MINUTES per frame at
    its default configuration, so it is measured offline, not per bench run;
    set BENCH_REMEASURE=1 to re-measure here)."""
    if os.environ.get("BENCH_REMEASURE") == "1" or not CACHE.exists():
        subprocess.run(
            [sys.executable, str(REPO / "benchmarks" / "measure_reference.py"),
             "3"],
            check=True, timeout=3600 * 2,
        )
    return json.loads(CACHE.read_text())


def main():
    rig, seq, frames = render_sequence()
    ref = run_reference()
    fps, ate = run_tpu(rig, seq, frames)
    result = {
        "metric": "stereo VO frames/s/chip (KITTI-size synthetic, 500 feats)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / ref["fps"], 3),
        "ate_m": round(ate, 4),
        "ref_fps": round(ref["fps"], 3),
        "ref_ate_m": round(float(ref["ate"]), 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
