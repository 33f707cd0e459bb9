"""Front-end tests: detection on synthetic corner grids, ZNCC/MI stereo
matching with known disparity, KLT tracking of known shifts
(SURVEY.md section 4 tiers 1-2)."""

import cv2
import jax.numpy as jnp
import numpy as np

from uasl_motion_estimation_tpu.models import frontend as fe
from uasl_motion_estimation_tpu.ops import image as im

RNG = np.random.default_rng(3)


def checkerboard(h=240, w=320, sq=20, noise=2.0):
    ys, xs = np.mgrid[0:h, 0:w]
    img = (((ys // sq) + (xs // sq)) % 2) * 200.0 + 20.0
    img += RNG.normal(scale=noise, size=img.shape)
    return jnp.asarray(img, jnp.float32)


def textured_scene(h=240, w=320, blur=3):
    img = RNG.uniform(0, 255, size=(h, w)).astype(np.float32)
    img = (cv2.GaussianBlur(img, (0, 0), blur) - 127.5) * 8 + 127.5
    return np.clip(img, 0, 255).astype(np.float32)


def shift_image(img: np.ndarray, dx: float, dy: float) -> np.ndarray:
    m = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, m, (img.shape[1], img.shape[0]),
                          flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT)


class TestImageOps:
    def test_pyramid_shapes(self):
        img = checkerboard()
        pyr = im.build_pyramid(img, 3)
        assert pyr[0].shape == (240, 320)
        assert pyr[1].shape == (120, 160)
        assert pyr[2].shape == (60, 80)

    def test_sobel_matches_opencv(self):
        img = np.asarray(checkerboard())
        gx, gy = im.sobel(jnp.asarray(img))
        gx_cv = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=3)
        gy_cv = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=3)
        # interior only (border handling differs)
        np.testing.assert_allclose(np.asarray(gx)[2:-2, 2:-2], gx_cv[2:-2, 2:-2],
                                   atol=1e-2)
        np.testing.assert_allclose(np.asarray(gy)[2:-2, 2:-2], gy_cv[2:-2, 2:-2],
                                   atol=1e-2)

    def test_bilinear_sample(self):
        img = jnp.asarray(np.arange(25, dtype=np.float32).reshape(5, 5))
        v = im.bilinear_sample(img, jnp.asarray([[1.5, 2.0]], jnp.float32))
        np.testing.assert_allclose(v, [11.5], atol=1e-6)

    def test_nms_keeps_isolated_peaks(self):
        resp = np.zeros((32, 32), np.float32)
        resp[8, 8] = 10.0
        resp[8, 9] = 5.0  # suppressed neighbor
        resp[20, 20] = 7.0
        out = np.asarray(im.nms(jnp.asarray(resp), radius=2))
        assert np.isfinite(out[8, 8]) and np.isfinite(out[20, 20])
        assert not np.isfinite(out[8, 9])


class TestDetection:
    def test_finds_checkerboard_corners(self):
        img = checkerboard(noise=0.5)
        xy, scores, valid = im.detect_features(jnp.asarray(img), max_features=256,
                                               nms_radius=4)
        xy, scores = np.asarray(xy)[np.asarray(valid)], np.asarray(scores)
        assert len(xy) > 50
        # detected corners should sit near multiples of the square size
        frac = np.minimum(xy % 20, 20 - (xy % 20))
        assert np.median(frac) < 2.5

    def test_fixed_shapes_and_determinism(self):
        img = jnp.asarray(textured_scene())
        xy1, s1, v1 = im.detect_features(img, max_features=128)
        xy2, s2, v2 = im.detect_features(img, max_features=128)
        assert xy1.shape == (128, 2)
        np.testing.assert_array_equal(np.asarray(xy1), np.asarray(xy2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


class TestGridDetection:
    def test_finds_checkerboard_corners(self):
        img = checkerboard(noise=0.5)
        xy, scores, valid = im.detect_features_grid(
            jnp.asarray(img), max_features=256
        )
        assert xy.shape == (256, 2)
        xy = np.asarray(xy)[np.asarray(valid)]
        assert len(xy) > 50
        frac = np.minimum(xy % 20, 20 - (xy % 20))
        assert np.median(frac) < 2.5

    def test_spatial_spread(self):
        """Bucketing guarantees at most one feature per cell -> spread
        features even when texture is concentrated."""
        img = np.full((240, 320), 50.0, np.float32)
        # strong texture only in one corner
        img[:60, :60] = np.asarray(textured_scene(60, 60))
        xy, scores, valid = im.detect_features_grid(
            jnp.asarray(img), max_features=128, quality_level=0.0
        )
        xy = np.asarray(xy)[np.asarray(valid)]
        gh, gw = im._grid_shape(240, 320, 128)
        # no two valid features share a grid cell
        cells = (xy[:, 1] // -(-240 // gh)).astype(int) * gw + (
            xy[:, 0] // -(-320 // gw)
        ).astype(int)
        assert len(np.unique(cells)) == len(cells)

    def test_determinism_and_budget(self):
        img = jnp.asarray(textured_scene())
        xy1, s1, v1 = im.detect_features_grid(img, max_features=200)
        xy2, _, v2 = im.detect_features_grid(img, max_features=200)
        assert xy1.shape == (200, 2)
        np.testing.assert_array_equal(np.asarray(xy1), np.asarray(xy2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        gh, gw = im._grid_shape(240, 320, 200)
        assert gh * gw <= 200


class TestStereoMatch:
    def _make_pair(self, disparity=17.0):
        right = textured_scene()
        left = shift_image(right, disparity, 0)  # left = right shifted +x
        return jnp.asarray(left), jnp.asarray(right)

    def test_zncc_recovers_disparity(self):
        d_gt = 17.0
        left, right = self._make_pair(d_gt)
        xy, _, valid = im.detect_features(left, max_features=128)
        fr, score, v = fe.match_stereo(left, right, xy, valid)
        v = np.asarray(v)
        assert v.sum() > 30
        disp = np.asarray(xy)[v, 0] - np.asarray(fr)[v, 0]
        assert np.median(np.abs(disp - d_gt)) < 0.5

    def test_subpixel_disparity(self):
        d_gt = 13.5
        left, right = self._make_pair(d_gt)
        xy, _, valid = im.detect_features(left, max_features=128)
        fr, _, v = fe.match_stereo(left, right, xy, valid)
        v = np.asarray(v)
        disp = np.asarray(xy)[v, 0] - np.asarray(fr)[v, 0]
        assert np.abs(np.median(disp) - d_gt) < 0.3

    def test_mi_matcher_cross_modal(self):
        # right image is an inverted-intensity version: ZNCC anti-correlates,
        # MI still matches (the reference's multispectral use case).
        d_gt = 11.0
        right = textured_scene()
        left = shift_image(right, d_gt, 0)
        right_inv = 255.0 - right
        xy, _, valid = im.detect_features(jnp.asarray(left), max_features=64)
        fr, _, v = fe.match_stereo(
            jnp.asarray(left), jnp.asarray(right_inv), xy, valid, use_mi=True
        )
        v = np.asarray(v)
        assert v.sum() > 15
        disp = np.asarray(xy)[v, 0] - np.asarray(fr)[v, 0]
        assert np.median(np.abs(disp - d_gt)) < 1.0

    def test_mi_matcher_subpixel_accuracy_vs_gt(self):
        """Cross-modal MI matching scored against the synthetic world's
        exact disparity (VERDICT r2 item 6): the MI score parabola gives
        subpixel accuracy — median error well under 1 px, precision at
        1 px >= 0.9 over accepted matches."""
        from uasl_motion_estimation_tpu.utils.synthetic import (
            CameraRig,
            SyntheticStereoSequence,
        )

        rig = CameraRig(fu=320.0, fv=320.0, cu=160.0, cv=96.0, baseline=0.54,
                        height=192, width=320)
        seq = SyntheticStereoSequence(n_frames=1, rig=rig, seed=2)
        left, right = seq.frame(0)
        right_inv = 255.0 - right  # cross-modal
        cfg = fe.MatcherConfig(max_disparity=64)
        xy, _, v0 = im.detect_features(jnp.asarray(left, jnp.float32),
                                       max_features=128)
        fr, _, v = fe.match_stereo(
            jnp.asarray(left, jnp.float32), jnp.asarray(right_inv, jnp.float32),
            xy, v0, cfg, use_mi=True,
        )
        gt_map = seq.gt_disparity(0)
        f_np, v_np = np.asarray(xy), np.asarray(v)
        gt = gt_map[
            np.clip(np.round(f_np[:, 1]).astype(int), 0, rig.height - 1),
            np.clip(np.round(f_np[:, 0]).astype(int), 0, rig.width - 1),
        ]
        matchable = np.asarray(v0) & (gt > cfg.min_disparity) & (gt < 63)
        acc = v_np & matchable
        assert acc.sum() > 40
        err = np.abs(np.asarray(xy[:, 0] - fr[:, 0]) - gt)[acc]
        assert np.median(err) < 0.3, np.median(err)
        assert np.mean(err < 1.0) >= 0.9, np.mean(err < 1.0)

    def test_gt_disparity_consistent_with_rendered_pair(self):
        """The synthetic gt_disparity map agrees with what ZNCC measures on
        the rendered pair itself (same-modal control for the map's math)."""
        from uasl_motion_estimation_tpu.utils.synthetic import (
            CameraRig,
            SyntheticStereoSequence,
        )

        rig = CameraRig(fu=320.0, fv=320.0, cu=160.0, cv=96.0, baseline=0.54,
                        height=192, width=320)
        seq = SyntheticStereoSequence(n_frames=1, rig=rig, seed=5)
        left, right = seq.frame(0)
        xy, _, v0 = im.detect_features(jnp.asarray(left, jnp.float32),
                                       max_features=96)
        fr, _, v = fe.match_stereo(
            jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32),
            xy, v0, fe.MatcherConfig(max_disparity=64),
        )
        gt_map = seq.gt_disparity(0)
        f_np, v_np = np.asarray(xy), np.asarray(v)
        gt = gt_map[
            np.clip(np.round(f_np[:, 1]).astype(int), 0, rig.height - 1),
            np.clip(np.round(f_np[:, 0]).astype(int), 0, rig.width - 1),
        ]
        ok = v_np & (gt > 0.5) & (gt < 63)
        assert ok.sum() > 40
        err = np.abs(np.asarray(xy[:, 0] - fr[:, 0]) - gt)[ok]
        assert np.median(err) < 0.3, np.median(err)

    def test_prior_narrow_search_matches_full(self):
        """A prior-centered prior_width search must agree with the full-range
        search whenever the prior is within prior_width/2 of the truth."""
        d_gt = 23.0
        left, right = self._make_pair(d_gt)
        xy, _, valid = im.detect_features(left, max_features=96)
        fr_full, _, v_full = fe.match_stereo(left, right, xy, valid)
        # prior off by a few px, as a tracked prev-frame disparity would be
        prior = jnp.full((xy.shape[0],), d_gt + 4.0)
        fr_pri, _, v_pri = fe.match_stereo(left, right, xy, valid,
                                           d_prior=prior)
        both = np.asarray(v_full & v_pri)
        assert both.sum() > 25
        np.testing.assert_allclose(np.asarray(fr_pri)[both, 0],
                                   np.asarray(fr_full)[both, 0], atol=0.26)

    def test_prior_search_stays_in_window(self):
        """Returned disparities must lie inside the searched prior window
        (plus the 1-D subpixel polish's per-iteration reach): a wrong prior
        yields in-window candidates — which downstream score/RANSAC gates
        handle — never a disparity outside the window it claimed to search."""
        d_gt = 40.0
        left, right = self._make_pair(d_gt)
        xy, _, valid = im.detect_features(left, max_features=96)
        prior = jnp.full((xy.shape[0],), 8.0)  # wrong by 32 px
        cfg = fe.MatcherConfig()
        fr, _, v = fe.match_stereo(left, right, xy, valid, cfg, d_prior=prior)
        disp = np.asarray(xy)[np.asarray(v), 0] - np.asarray(fr)[np.asarray(v), 0]
        d0 = max(8 - cfg.prior_width // 2, 0)  # window start (clipped at 0)
        polish = 0.5 + cfg.refine_iters  # subpixel parabola + 1-D LK reach
        assert disp.size == 0 or (
            np.all(disp >= d0 - polish)
            and np.all(disp <= d0 + cfg.prior_width - 1 + polish)
        )

    def test_row_preserved(self):
        left, right = self._make_pair()
        xy, _, valid = im.detect_features(left, max_features=64)
        fr, _, _ = fe.match_stereo(left, right, xy, valid)
        np.testing.assert_allclose(np.asarray(fr)[:, 1], np.asarray(xy)[:, 1],
                                   atol=1e-5)


class TestKLT:
    def test_tracks_pure_translation(self):
        img = textured_scene()
        dx, dy = 6.3, -3.7
        nxt = shift_image(img, dx, dy)
        xy, _, valid = im.detect_features(jnp.asarray(img), max_features=128)
        res = fe.klt_track(jnp.asarray(img), jnp.asarray(nxt), xy, valid)
        v = np.asarray(res.valid)
        assert v.sum() > 40
        d = np.asarray(res.pts)[v] - np.asarray(xy)[v]
        np.testing.assert_allclose(np.median(d, axis=0), [dx, dy], atol=0.25)

    def test_large_motion_needs_pyramid(self):
        img = textured_scene()
        dx = 22.0  # far beyond the 5-px window; only coarse levels can see it
        nxt = shift_image(img, dx, 0)
        xy, _, valid = im.detect_features(jnp.asarray(img), max_features=128)
        res = fe.klt_track(jnp.asarray(img), jnp.asarray(nxt), xy, valid)
        v = np.asarray(res.valid)
        assert v.sum() > 30
        d = np.asarray(res.pts)[v, 0] - np.asarray(xy)[v, 0]
        assert abs(np.median(d) - dx) < 0.5

    def test_flat_regions_rejected(self):
        img = np.full((120, 160), 100.0, np.float32)
        img[:, :40] = np.asarray(textured_scene(120, 160))[:, :40]
        pts = jnp.asarray([[100.0, 60.0], [20.0, 60.0]], jnp.float32)  # flat, textured
        res = fe.klt_track(
            jnp.asarray(img), jnp.asarray(img), pts, jnp.ones(2, bool)
        )
        assert not bool(res.valid[0])  # flat patch: untrackable


class TestQuadMatch:
    def test_end_to_end_quads(self):
        scene = textured_scene(256, 384)
        d = 14.0
        motion = (3.0, 1.0)
        prev_left = shift_image(scene, d, 0)
        prev_right = scene
        cur_left = shift_image(prev_left, *motion)
        cur_right = shift_image(prev_right, *motion)
        qm = fe.quad_match_frames(
            jnp.asarray(prev_left), jnp.asarray(prev_right),
            jnp.asarray(cur_left), jnp.asarray(cur_right), max_features=128,
        )
        v = np.asarray(qm.valid)
        assert v.sum() > 25
        uv = np.asarray(qm.uv)[v]
        disp_prev = uv[:, 0, 0] - uv[:, 1, 0]
        flow = uv[:, 2] - uv[:, 0]
        assert np.abs(np.median(disp_prev) - d) < 0.5
        np.testing.assert_allclose(np.median(flow, axis=0), motion, atol=0.3)
