"""Round-2 follow-up ablations: gather kernel vs XLA gather inside ZNCC,
rewritten KLT path, and the full step at large batch."""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path
from unittest import mock

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from uasl_motion_estimation_tpu.models import frontend as fe
from uasl_motion_estimation_tpu.models.pipeline import default_config, vo_step
from uasl_motion_estimation_tpu.ops import image as im
from uasl_motion_estimation_tpu.ops.geometry import Intrinsics
from uasl_motion_estimation_tpu.utils.profiling import force, timeit_forced
from uasl_motion_estimation_tpu.utils.synthetic import (
    CameraRig,
    SyntheticStereoSequence,
)

BATCH = int(os.environ.get("PROF_BATCH", "16"))
REPS = int(os.environ.get("PROF_REPS", "5"))
results = {}


def run(name, fn, *args, batch=None):
    batch = batch or BATCH
    bfn = jax.jit(jax.vmap(fn))
    bargs = tuple(jnp.broadcast_to(a, (batch,) + a.shape) for a in args)
    t, _ = timeit_forced(bfn, *bargs, reps=REPS)
    per = t / batch
    results[name] = per * 1e3
    print(f"  {name:46s} {per * 1e3:9.2f} ms/item (vmap x{batch})", flush=True)
    return per


def main():
    rig = CameraRig()
    seq = SyntheticStereoSequence(n_frames=3, rig=rig, seed=0)
    l0, r0 = seq.frame(0)
    l1, r1 = seq.frame(1)
    cfg = default_config(Intrinsics(rig.fu, rig.fv, rig.cu, rig.cv),
                         rig.baseline)
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    dl0 = jax.device_put(jnp.asarray(l0, jnp.float32))
    dr0 = jax.device_put(jnp.asarray(r0, jnp.float32))
    dl1 = jax.device_put(jnp.asarray(l1, jnp.float32))
    dr1 = jax.device_put(jnp.asarray(r1, jnp.float32))
    force((dl0, dr0, dl1, dr1))
    key = jax.random.key(0)

    feats, _, valid = jax.jit(lambda i: im.detect_features_grid(
        i, max_features=cfg.max_features, quality_level=cfg.detect_quality))(dl0)
    feats = jnp.asarray(force(feats))
    valid = jnp.asarray(force(valid))
    print(f"valid detections: {int(valid.sum())}", flush=True)

    run("detect grid (shift filters)", lambda img: im.detect_features_grid(
        img, max_features=cfg.max_features), dl0)

    # ZNCC with the DMA gather kernel (default on TPU)
    run("match_stereo (pallas DMA gather)",
        lambda l, r, f, v: fe.match_stereo(l, r, f, v, cfg.matcher),
        dl0, dr0, feats, valid)

    # ZNCC with the XLA advanced-indexing gather
    with mock.patch(
        "uasl_motion_estimation_tpu.ops.pallas.support.tpu_kernels_supported",
        return_value=False,
    ), mock.patch(
        "uasl_motion_estimation_tpu.ops.pallas.gather.pallas_gather_supported",
        return_value=False,
    ):
        run("match_stereo (XLA gather)",
            lambda l, r, f, v: fe.match_stereo(l, r, f, v, cfg.matcher),
            dl0, dr0, feats, valid)

        run("klt new-xla (XLA gather)",
            lambda p, n, f, v: fe.klt_track(p, n, f, v, cfg.klt),
            dl0, dl1, feats, valid)

    run("klt new-xla (pallas gather)",
        lambda p, n, f, v: fe.klt_track(p, n, f, v, cfg.klt),
        dl0, dl1, feats, valid)

    for b in (16, 32):
        run(f"vo_step full b{b} (new)", lambda a, bb, c, d, k: vo_step(
            a, bb, c, d, k, cfg), dl0, dr0, dl1, dr1, key, batch=b)

    out = REPO / "benchmarks" / "variants2.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
