"""Multi-device tests on the simulated 8-device CPU mesh (SURVEY.md section 4,
item 4): parallel pose chaining and the segment-sharded sequence step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uasl_motion_estimation_tpu import parallel
from uasl_motion_estimation_tpu.models.pipeline import default_config
from uasl_motion_estimation_tpu.ops import geometry as geo, lie
from uasl_motion_estimation_tpu.utils.synthetic import (
    CameraRig,
    SyntheticStereoSequence,
)

RNG = np.random.default_rng(11)


def random_motions(n):
    ms = []
    for _ in range(n):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray(
            RNG.normal(scale=0.1, size=3), jnp.float32)))
        T[:3, 3] = RNG.normal(scale=0.5, size=3)
        ms.append(T)
    return jnp.asarray(np.stack(ms))


def serial_chain(motions):
    pose = np.eye(4)
    out = []
    for m in np.asarray(motions, np.float64):
        pose = pose @ np.linalg.inv(m)
        out.append(pose.copy())
    return np.stack(out)


class TestChain:
    def test_chain_matches_serial(self):
        motions = random_motions(16)
        got = np.asarray(parallel.chain_motions(motions))
        np.testing.assert_allclose(got, serial_chain(motions), atol=1e-4)

    def test_sharded_chain_matches_serial(self):
        assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
        motions = random_motions(24)  # 3 frames per device
        mesh = parallel.make_mesh(8)
        got = np.asarray(parallel.sharded_chain_motions(motions, mesh))
        np.testing.assert_allclose(got, serial_chain(motions), atol=1e-4)


class TestShardedSequence:
    @pytest.fixture(scope="class")
    def setup(self):
        rig = CameraRig(fu=200.0, fv=200.0, cu=80.0, cv=48.0, baseline=0.5,
                        height=96, width=160)
        n_pairs = 8
        seq = SyntheticStereoSequence(n_frames=n_pairs + 1, rig=rig, seed=6)
        frames = [seq.frame(i) for i in range(n_pairs + 1)]
        return rig, seq, frames, n_pairs

    def test_sharded_sequence_vo(self, setup):
        rig, seq, frames, n_pairs = setup
        cfg = default_config(
            geo.Intrinsics(rig.fu, rig.fv, rig.cu, rig.cv), rig.baseline
        )._replace(max_features=192)

        ls = jnp.asarray(np.stack([f[0] for f in frames]), jnp.float32)
        rs = jnp.asarray(np.stack([f[1] for f in frames]), jnp.float32)
        keys = jax.random.split(jax.random.key(0), n_pairs)

        mesh = parallel.make_mesh(8)
        poses, success, n_inl = parallel.sharded_sequence_vo(
            parallel.shard_frames(ls[:-1], mesh),
            parallel.shard_frames(rs[:-1], mesh),
            parallel.shard_frames(ls[1:], mesh),
            parallel.shard_frames(rs[1:], mesh),
            keys, cfg, mesh,
        )
        assert bool(jnp.all(success)), np.asarray(n_inl)
        est = np.concatenate([np.zeros((1, 3)), np.asarray(poses)[:, :3, 3]])
        gt = seq.gt_positions() - seq.gt_positions()[0]
        err = np.linalg.norm(est - gt, axis=-1).max()
        # loose GT check for the tiny low-res config; exactness is checked below
        assert err < 0.25, f"max position error {err:.3f} m"

        # sharding must not change the result: same per-pair solves on one
        # device, chained serially, give the same trajectory
        from uasl_motion_estimation_tpu.models.pipeline import vo_step

        single = [
            vo_step(ls[i], rs[i], ls[i + 1], rs[i + 1], keys[i], cfg)
            for i in range(n_pairs)
        ]
        motions = np.stack([np.asarray(o.motion) for o in single])
        np.testing.assert_allclose(
            np.asarray(poses), serial_chain(motions), atol=5e-4
        )


class TestStitching:
    def make_segments(self, s=4, f=8, overlap=2, noise=0.0, seed=0):
        """Ground-truth trajectory cut into overlapping segments, each
        re-gauged to its own first frame (+ optional per-segment noise)."""
        from uasl_motion_estimation_tpu.parallel import stitching

        rng = np.random.default_rng(seed)
        n = s * (f - overlap) + overlap
        gt = []
        pose = np.eye(4)
        for i in range(n):
            T = np.eye(4)
            T[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray(
                rng.normal(scale=0.02, size=3), jnp.float32)))
            T[:3, 3] = [0.1, 0, 0.8]
            pose = pose @ T
            gt.append(pose.copy())
        gt = np.stack(gt)
        segs = []
        for si in range(s):
            start = si * (f - overlap)
            chunk = gt[start : start + f].copy()
            chunk = np.linalg.inv(chunk[0]) @ chunk  # own gauge
            if noise:
                for k in range(1, f):
                    d = np.eye(4)
                    d[:3, 3] = rng.normal(scale=noise, size=3)
                    chunk[k] = chunk[k] @ d
            segs.append(chunk)
        return jnp.asarray(np.stack(segs), jnp.float32), gt

    def test_exact_segments_stitch_exactly(self):
        from uasl_motion_estimation_tpu.parallel import stitching

        segs, gt = self.make_segments()
        out = np.asarray(stitching.stitch_segments(segs, overlap=2))
        want = np.linalg.inv(gt[0]) @ gt
        assert out.shape == want.shape
        np.testing.assert_allclose(out, want, atol=1e-4)

    def test_noisy_overlap_fuses(self):
        from uasl_motion_estimation_tpu.parallel import stitching

        segs, gt = self.make_segments(noise=0.01, seed=3)
        out = np.asarray(stitching.stitch_segments(segs, overlap=2))
        want = np.linalg.inv(gt[0]) @ gt
        err = np.linalg.norm(out[:, :3, 3] - want[:, :3, 3], axis=-1)
        assert err.max() < 0.15, err.max()

    def test_covariance_weights_prefer_confident_frames(self):
        from uasl_motion_estimation_tpu.parallel import stitching

        covs = jnp.stack([jnp.eye(6) * 1e-4, jnp.eye(6) * 1e2])
        w = np.asarray(stitching.weights_from_covariances(covs))
        assert w[0] > 1e3 * w[1]


class TestShardedUnified:
    def test_window_parallel_unified_matches_single_device(self):
        """The unified integrated system with windows sharded over the
        8-device mesh must reproduce the single-device scan: windows are
        independent and keys derive from global motion indices, so the
        per-window solves are the same computation placed differently."""
        from uasl_motion_estimation_tpu.models.smoother import (
            SmootherConfig,
            compose_unified,
            unified_system_scan,
        )
        from uasl_motion_estimation_tpu.utils import metrics

        rig = CameraRig(fu=200.0, fv=200.0, cu=80.0, cv=48.0, baseline=0.5,
                        height=96, width=160)
        n = 34  # 8 aligned windows of 5 at stride 4 + clamped tail (29)
        seq = SyntheticStereoSequence(n_frames=n, rig=rig, seed=6)
        frames = [seq.frame(i) for i in range(n)]
        ls = jnp.asarray(np.clip(np.stack([f[0] for f in frames]), 0, 255)
                         .astype(np.uint8))
        rs = jnp.asarray(np.clip(np.stack([f[1] for f in frames]), 0, 255)
                         .astype(np.uint8))
        pipe = default_config(
            geo.Intrinsics(rig.fu, rig.fv, rig.cu, rig.cv), rig.baseline,
            image_shape=(96, 160),
        )._replace(max_features=128)
        cfg = SmootherConfig(pipe=pipe)
        key = jax.random.key(0)

        mesh = parallel.make_mesh(8)
        out_sharded = jax.device_get(
            parallel.sharded_unified_scan(ls, rs, key, cfg, mesh)
        )
        out_single = jax.device_get(
            unified_system_scan(ls, rs, key, cfg, wchunk=3)
        )
        assert out_sharded.vo_motions.shape == out_single.vo_motions.shape
        # same problems, different placement: agree to float noise
        np.testing.assert_allclose(
            out_sharded.vo_motions, out_single.vo_motions, atol=1e-3
        )
        np.testing.assert_allclose(
            out_sharded.refined_motions, out_single.refined_motions,
            atol=1e-2
        )
        res = compose_unified(out_sharded, n, cfg)
        gt = seq.gt_positions()
        ate = metrics.ate_rmse(res.traj_ba[:, :3, 3], gt)
        assert ate < 0.15, ate
