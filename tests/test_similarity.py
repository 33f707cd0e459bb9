"""Similarity-measure tests: MI/entropy/ZNCC parity vs OpenCV histograms and
known distributions (SURVEY.md section 4, tier 1)."""

import cv2
import jax.numpy as jnp
import numpy as np

from uasl_motion_estimation_tpu.ops import similarity as sim

RNG = np.random.default_rng(2)


def reference_mi(a: np.ndarray, b: np.ndarray, bins=20) -> float:
    """Faithful numpy re-statement of computeMutualInformation
    (mutual_information.cpp:55-86) used as the parity oracle."""
    ha = cv2.calcHist([a.astype(np.uint8)], [0], None, [bins], [0, 256]).ravel()
    hb = cv2.calcHist([b.astype(np.uint8)], [0], None, [bins], [0, 256]).ravel()
    hj = cv2.calcHist(
        [a.astype(np.uint8), b.astype(np.uint8)], [0, 1], None, [bins, bins],
        [0, 256, 0, 256],
    )
    n = a.size
    ha, hb, hj = ha / n, hb / n, hj / n
    mi = 0.0
    for i in range(bins):
        for j in range(bins):
            if hj[i, j] > 0 and ha[i] > 0 and hb[j] > 0:
                mi += hj[i, j] * np.log2(hj[i, j] / (ha[i] * hb[j]))
    return float(mi)


def reference_entropy(a: np.ndarray, bins=20) -> float:
    """computeEntropy oracle (mutual_information.cpp:28-45)."""
    h = cv2.calcHist([a.astype(np.uint8)], [0], None, [bins], [0, 256]).ravel() / a.size
    h = h[h > 0]
    return float(-np.sum(h * np.log2(h)))


class TestEntropy:
    def test_constant_patch_zero(self):
        img = jnp.full((16, 16), 87.0)
        np.testing.assert_allclose(sim.entropy(img), 0.0, atol=1e-6)

    def test_uniform_max(self):
        vals = np.arange(20).repeat(20) * 12.8 + 1.0  # one value per bin
        img = jnp.asarray(vals.reshape(20, 20), jnp.float32)
        np.testing.assert_allclose(sim.entropy(img), np.log2(20), atol=1e-5)

    def test_matches_reference(self):
        for _ in range(5):
            a = RNG.integers(0, 256, size=(21, 21)).astype(np.uint8)
            np.testing.assert_allclose(
                float(sim.entropy(jnp.asarray(a))), reference_entropy(a), atol=1e-4
            )


class TestMutualInformation:
    def test_identical_patches_equal_entropy(self):
        a = RNG.integers(0, 256, size=(15, 15)).astype(np.uint8)
        ja = jnp.asarray(a)
        np.testing.assert_allclose(
            float(sim.mutual_information(ja, ja)), float(sim.entropy(ja)), atol=1e-4
        )

    def test_independent_near_zero(self):
        a = RNG.integers(0, 256, size=(128, 128)).astype(np.uint8)
        b = RNG.integers(0, 256, size=(128, 128)).astype(np.uint8)
        assert float(sim.mutual_information(jnp.asarray(a), jnp.asarray(b))) < 0.05

    def test_matches_reference(self):
        for _ in range(5):
            a = RNG.integers(0, 256, size=(21, 21)).astype(np.uint8)
            b = np.clip(a.astype(int) + RNG.integers(-30, 30, a.shape), 0, 255)
            np.testing.assert_allclose(
                float(sim.mutual_information(jnp.asarray(a), jnp.asarray(b))),
                reference_mi(a, b.astype(np.uint8)),
                atol=1e-3,
            )

    def test_batched(self):
        a = RNG.integers(0, 256, size=(8, 11, 11)).astype(np.uint8)
        b = RNG.integers(0, 256, size=(8, 11, 11)).astype(np.uint8)
        batched = sim.mutual_information(jnp.asarray(a), jnp.asarray(b))
        assert batched.shape == (8,)
        for i in range(8):
            np.testing.assert_allclose(
                float(batched[i]),
                float(sim.mutual_information(jnp.asarray(a[i]), jnp.asarray(b[i]))),
                atol=1e-5,
            )

    def test_invariant_to_monotone_remap(self):
        # MI should be high for a deterministic intensity remap (cross-modal
        # robustness that ZNCC lacks) -- the reason the reference uses MI for
        # multispectral scale estimation.
        a = RNG.integers(0, 256, size=(64, 64)).astype(np.uint8)
        remapped = (255 - a).astype(np.uint8)
        mi = float(sim.mutual_information(jnp.asarray(a), jnp.asarray(remapped)))
        ent = float(sim.entropy(jnp.asarray(a)))
        assert mi > 0.9 * ent


class TestZNCC:
    def test_identical_one(self):
        a = RNG.normal(size=(13, 13)).astype(np.float32) * 50 + 128
        np.testing.assert_allclose(float(sim.zncc(jnp.asarray(a), jnp.asarray(a))),
                                   1.0, atol=1e-5)

    def test_negated_minus_one(self):
        a = RNG.normal(size=(13, 13)).astype(np.float32)
        np.testing.assert_allclose(float(sim.zncc(jnp.asarray(a), jnp.asarray(-a))),
                                   -1.0, atol=1e-5)

    def test_brightness_gain_invariant(self):
        a = RNG.normal(size=(13, 13)).astype(np.float32) * 40 + 100
        b = a * 1.7 + 25.0
        np.testing.assert_allclose(float(sim.zncc(jnp.asarray(a), jnp.asarray(b))),
                                   1.0, atol=1e-5)

    def test_matches_opencv_ccoeff_normed(self):
        a = RNG.integers(0, 256, size=(17, 17)).astype(np.uint8)
        b = RNG.integers(0, 256, size=(17, 17)).astype(np.uint8)
        cv_val = cv2.matchTemplate(a.astype(np.float32), b.astype(np.float32),
                                   cv2.TM_CCOEFF_NORMED)[0, 0]
        np.testing.assert_allclose(float(sim.zncc(jnp.asarray(a), jnp.asarray(b))),
                                   cv_val, atol=1e-4)

    def test_ncc_identical(self):
        a = RNG.uniform(0.1, 1.0, size=(9, 9)).astype(np.float32)
        np.testing.assert_allclose(float(sim.ncc(jnp.asarray(a), jnp.asarray(a))),
                                   1.0, atol=1e-5)


def test_quantise_matches_opencv_binning():
    vals = np.arange(256, dtype=np.uint8).reshape(16, 16)
    bins = np.asarray(sim.quantise(jnp.asarray(vals), 20))
    h_ours = np.bincount(bins.ravel(), minlength=20)
    h_cv = cv2.calcHist([vals], [0], None, [20], [0, 256]).ravel()
    np.testing.assert_array_equal(h_ours, h_cv.astype(int))
