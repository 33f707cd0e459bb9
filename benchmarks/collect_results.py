"""Assemble the consolidated round-5 results rollup.

Collects every committed benchmark artifact into benchmarks/results_r05.json
keyed by BASELINE.json config, with presence checks so a missing artifact is
an explicit null rather than a silent omission.

Run AFTER the individual benchmarks:
    python benchmarks/full_system.py
    python benchmarks/long_sequence.py
    python benchmarks/bench_corrupted.py
    python benchmarks/streaming.py   (+ BENCH_STREAM_TPU=1 variant)
    python benchmarks/extra_configs.py all
    python benchmarks/stress_worlds.py
    python benchmarks/cov_circuit.py
    python benchmarks/measure_reference_mono.py
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py
    python bench.py > /tmp/bench_headline.json  (or rely on BENCH_r0N.json)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
B = REPO / "benchmarks"


def load(path: Path):
    if path.exists():
        return json.loads(path.read_text())
    return None


def main():
    headline = None
    # prefer a fresh local bench output if provided, else the latest
    # driver-captured BENCH_r0N.json
    for cand in [Path("/tmp/bench_headline.json")] + sorted(
        REPO.glob("BENCH_r0*.json"), reverse=True
    ):
        headline = load(cand)
        if headline:
            headline["_source"] = cand.name
            break

    extra = load(B / "results_extra_configs.json") or {}
    out = {
        "round": 5,
        "config1_stereo_vo_headline": headline,
        "config1b_stereo_vo_corrupted": load(B / "corrupted_r04.json"),
        "config2_klt_pose": extra.get("config2_klt_pose"),
        "config3_mi_matcher": extra.get("config3_mi_matcher"),
        "config3b_mi_scale": extra.get("config3b_mi_scale"),
        "config4_integrated_vo_ba": load(B / "full_system_r05.json")
        or load(B / "full_system_r04.json"),
        "config4b_ba_window_throughput": extra.get("config4_ba_windows"),
        "config5_weak_scaling": load(B / "scaling_weak.json"),
        "mono_vo_staged": extra.get("config_mono_vo"),
        "latency_mode": extra.get("config_latency_mode"),
        "stress_worlds": load(B / "stress_r05.json"),
        "covariance_circuit": load(B / "cov_circuit_r05.json"),
        "streaming_cpu": load(B / "streaming_r05.json") or load(B / "streaming_r04.json"),
        "streaming_tpu": load(B / "streaming_tpu_r05.json") or load(B / "streaming_tpu_r04.json"),
        "long_sequence_501": load(B / "long_sequence_r05.json")
        or load(B / "long_sequence_r04.json"),
        "reference_cpu_baseline": load(B / "reference_cpu.json"),
        "reference_cpu_corrupted": load(B / "reference_cpu_corrupted.json"),
        "reference_cpu_mono": load(B / "reference_cpu_mono.json"),
        "profiling_stage_budget": {
            "unified_engine": load(B / "unified_stage_split.json"),
            "track_stage": load(B / "track_stage_split.json"),
        },
    }
    missing = [k for k, v in out.items() if v is None]
    out["missing"] = missing
    (B / "results_r05.json").write_text(json.dumps(out, indent=1))
    print(json.dumps({"written": "benchmarks/results_r05.json",
                      "missing": missing}))
    return 0 if not missing else 1


if __name__ == "__main__":
    sys.exit(main())
