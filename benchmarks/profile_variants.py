"""Ablate the per-frame hot paths on the real chip with honest timing.

Variants:
  - detection: grid-bucketed vs top-k
  - KLT: fused Pallas level kernel vs XLA tile path
  - pose solve: triad closed-form seed vs legacy 12-iter GN hypotheses
  - full vo_step at vmap batch 8/16/32

Writes benchmarks/variants.json.
"""

from __future__ import annotations

import json
import os
import sys
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

REPS = int(os.environ.get("PROF_REPS", "5"))
results = {}


BATCH = int(os.environ.get("PROF_BATCH", "16"))


def run(name, fn, *args, batch=None):
    batch = batch or BATCH
    bfn = jax.jit(jax.vmap(fn))
    bargs = tuple(jnp.broadcast_to(a, (batch,) + a.shape) for a in args)
    t, _ = timeit_forced(bfn, *bargs, reps=REPS)
    per = t / batch
    results[name] = per * 1e3
    print(f"  {name:44s} {per * 1e3:9.2f} ms/item (vmap x{batch})", flush=True)
    return per


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
    force((dl0, dr0, dl1, dr1))
    key = jax.random.key(0)

    # --- detection sub-stages ---
    run("detect: shi_tomasi response", lambda img: im.shi_tomasi_response(img),
        dl0)

    def resp_nms(img):
        raw = im.shi_tomasi_response(img)
        pooled = jax.lax.reduce_window(
            raw, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
        return jnp.where(raw >= pooled, raw, -jnp.inf)

    run("detect: response + 3x3 nms", resp_nms, dl0)
    run("detect grid (full)", lambda img: im.detect_features_grid(
        img, max_features=cfg.max_features), dl0)
    run("detect topk (full)", lambda img: im.detect_features(
        img, max_features=cfg.max_features), dl0)

    feats, _, valid = jax.jit(lambda i: im.detect_features_grid(
        i, max_features=cfg.max_features))(dl0)
    feats = jnp.asarray(force(feats))
    valid = jnp.asarray(force(valid))

    # --- KLT (XLA tile path; the fused Pallas kernel was deleted in round 3
    # after measuring a 1.8x loss at every config) ---
    run("klt xla-tiles", lambda p, n, f, v: fe.klt_track(
        p, n, f, v, cfg.klt), dl0, dl1, feats, valid)

    # --- stereo matching ---
    run("match_stereo zncc", lambda l, r, f, v: fe.match_stereo(
        l, r, f, v, cfg.matcher), dl0, dr0, feats, valid)

    # --- solve: triad vs legacy GN hypotheses ---
    qm = jax.jit(lambda a, b, c, d: fe.quad_match_frames(
        a, b, c, d, max_features=cfg.max_features, matcher=cfg.matcher,
        klt=cfg.klt, detector="grid"))
    m = qm(dl0, dr0, dl1, dr1)
    muv = jnp.asarray(force(m.uv))
    mvalid = jnp.asarray(force(m.valid))
    vo_3pt = cfg.vo
    vo_gn = cfg.vo._replace(hyp_solver="gn", ransac_gn_iters=12)
    run("solve triad-seed (2 GN)", lambda mm, vv, kk: stereo_vo_solve(
        mm, vv, kk, vo_3pt), muv, mvalid, key)
    run("solve legacy GN (12 it)", lambda mm, vv, kk: stereo_vo_solve(
        mm, vv, kk, vo_gn), muv, mvalid, key)

    # --- full step at several batch sizes ---
    for b in (8, 16, 32):
        run(f"vo_step full b{b}", lambda a, bb, c, d, k: vo_step(
            a, bb, c, d, k, cfg), dl0, dr0, dl1, dr1, key, batch=b)

    out = REPO / "benchmarks" / "variants.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
