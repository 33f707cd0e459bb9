"""Per-stage device-compute budget for the stereo-VO frame step.

Honest timing on the tunneled TPU: every repetition forces the output to the
host (utils/profiling.force) because block_until_ready is a no-op on this
backend. Stages are timed both standalone (includes ~1 dispatch+fetch fixed
round-trip) and batched (vmap x B, amortizing the round-trip) so the table
separates device compute from host latency.

Writes benchmarks/stage_budget.json and prints a table.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from uasl_motion_estimation_tpu.models import frontend as fe
from uasl_motion_estimation_tpu.models.pipeline import default_config, vo_step
from uasl_motion_estimation_tpu.models.stereo_vo import stereo_vo_solve
from uasl_motion_estimation_tpu.ops import image as im
from uasl_motion_estimation_tpu.ops.geometry import Intrinsics
from uasl_motion_estimation_tpu.utils.profiling import force, timeit_forced
from uasl_motion_estimation_tpu.utils.synthetic import (
    CameraRig,
    SyntheticStereoSequence,
)

B = int(os.environ.get("PROF_BATCH", "8"))
REPS = int(os.environ.get("PROF_REPS", "5"))


def main():
    rig = CameraRig()
    seq = SyntheticStereoSequence(n_frames=3, rig=rig, seed=0)
    l0, r0 = seq.frame(0)
    l1, r1 = seq.frame(1)
    cfg = default_config(Intrinsics(rig.fu, rig.fv, rig.cu, rig.cv), rig.baseline)

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    dl0 = jax.device_put(jnp.asarray(l0, jnp.float32))
    dr0 = jax.device_put(jnp.asarray(r0, jnp.float32))
    dl1 = jax.device_put(jnp.asarray(l1, jnp.float32))
    dr1 = jax.device_put(jnp.asarray(r1, jnp.float32))
    key = jax.random.key(0)
    force((dl0, dr0, dl1, dr1))

    # fixed host round-trip: tiny jitted op, forced
    noop = jax.jit(lambda a: a[:2, :2] * 2.0)
    rt, _ = timeit_forced(noop, dl0, reps=REPS)

    results = {"device": str(jax.devices()[0].device_kind),
               "fixed_roundtrip_ms": rt * 1e3, "batch": B}
    rows = [("fixed dispatch+fetch round-trip", rt, None)]

    def stage(name, fn, *args, batched_fn=None, bargs=None):
        t1, _ = timeit_forced(fn, *args, reps=REPS)
        tb = None
        if batched_fn is not None:
            tb_total, _ = timeit_forced(batched_fn, *bargs, reps=REPS)
            tb = tb_total / B
        rows.append((name, t1, tb))
        results[name] = {"standalone_ms": t1 * 1e3,
                         "batched_ms_per_item": None if tb is None else tb * 1e3}
        print(f"  {name:34s} {t1 * 1e3:9.2f} ms"
              + (f"   {tb * 1e3:9.2f} ms/item (vmap x{B})" if tb else ""),
              flush=True)

    bl0 = jnp.broadcast_to(dl0, (B,) + dl0.shape)
    br0 = jnp.broadcast_to(dr0, (B,) + dr0.shape)
    bl1 = jnp.broadcast_to(dl1, (B,) + dl1.shape)
    br1 = jnp.broadcast_to(dr1, (B,) + dr1.shape)
    keys = jax.random.split(key, B)

    # --- detection ---
    det = jax.jit(lambda img: im.detect_features(img, max_features=cfg.max_features))
    stage("detect_features", det, dl0,
          batched_fn=jax.jit(jax.vmap(lambda img: im.detect_features(
              img, max_features=cfg.max_features))),
          bargs=(bl0,))

    feats, scores, valid = det(dl0)
    feats, valid = force((feats, valid))
    feats, valid = jnp.asarray(feats), jnp.asarray(valid)

    # --- stereo match ---
    ms = jax.jit(lambda l, r, f, v: fe.match_stereo(l, r, f, v, cfg.matcher))
    stage("match_stereo (zncc)", ms, dl0, dr0, feats, valid,
          batched_fn=jax.jit(jax.vmap(
              lambda l, r, f, v: fe.match_stereo(l, r, f, v, cfg.matcher))),
          bargs=(bl0, br0, jnp.broadcast_to(feats, (B,) + feats.shape),
                 jnp.broadcast_to(valid, (B,) + valid.shape)))

    # --- KLT ---
    kl = jax.jit(lambda p, n, f, v: fe.klt_track(p, n, f, v, cfg.klt))
    stage("klt_track", kl, dl0, dl1, feats, valid,
          batched_fn=jax.jit(jax.vmap(
              lambda p, n, f, v: fe.klt_track(p, n, f, v, cfg.klt))),
          bargs=(bl0, bl1, jnp.broadcast_to(feats, (B,) + feats.shape),
                 jnp.broadcast_to(valid, (B,) + valid.shape)))

    # --- quad match (full front-end) ---
    qm = jax.jit(lambda a, b, c, d: fe.quad_match_frames(
        a, b, c, d, max_features=cfg.max_features, matcher=cfg.matcher,
        klt=cfg.klt,
        detect_kwargs=(("nms_radius", cfg.detect_nms_radius),
                       ("quality_level", cfg.detect_quality))))
    stage("quad_match_frames (front-end)", qm, dl0, dr0, dl1, dr1)

    matches = qm(dl0, dr0, dl1, dr1)
    muv, mvalid = force((matches.uv, matches.valid))
    muv, mvalid = jnp.asarray(muv), jnp.asarray(mvalid)

    # --- pose solve ---
    sv = jax.jit(lambda m, v, k: stereo_vo_solve(m, v, k, cfg.vo))
    stage("stereo_vo_solve (ransac+refine)", sv, muv, mvalid, key,
          batched_fn=jax.jit(jax.vmap(
              lambda m, v, k: stereo_vo_solve(m, v, k, cfg.vo))),
          bargs=(jnp.broadcast_to(muv, (B,) + muv.shape),
                 jnp.broadcast_to(mvalid, (B,) + mvalid.shape), keys))

    # --- full frame step ---
    vs = jax.jit(lambda a, b, c, d, k: vo_step(a, b, c, d, k, cfg))
    stage("vo_step (full frame)", vs, dl0, dr0, dl1, dr1, key,
          batched_fn=jax.jit(jax.vmap(
              lambda a, b, c, d, k: vo_step(a, b, c, d, k, cfg))),
          bargs=(bl0, br0, bl1, br1, keys))

    out_path = REPO / "benchmarks" / "stage_budget.json"
    out_path.write_text(json.dumps(results, indent=2))
    print(f"\nwrote {out_path}")
    print(f"fixed round-trip: {rt * 1e3:.1f} ms "
          f"(subtract from standalone numbers)")


if __name__ == "__main__":
    main()
