"""Native async frame-loader tests: parity with the pure-Python reader,
layout handling, clean shutdown mid-stream."""

import numpy as np
import pytest

from uasl_motion_estimation_tpu.native import (
    AsyncFrameLoader,
    build_native,
    native_available,
)
from uasl_motion_estimation_tpu.utils import io as uio

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(
    not (build_native() and native_available()),
    reason="native loader not buildable in this environment",
)


@pytest.fixture
def kitti_dir(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(5):
        img = rng.integers(0, 255, (380, 120), np.uint8)
        cv2.imwrite(str(tmp_path / f"L_{i:06d}.png"), img)
        cv2.imwrite(str(tmp_path / f"R_{i:06d}.png"), img // 2)
    return tmp_path


class TestAsyncLoader:
    def test_matches_python_reader(self, kitti_dir):
        with AsyncFrameLoader(str(kitti_dir)) as fl:
            native = list(fl)
        ref = uio.ImageSequenceReader(str(kitti_dir))
        assert len(native) == 5
        for (idx, l, r), (lp, rp) in zip(native, ref):
            assert l.shape == (374, 120)  # KITTI crop applied
            np.testing.assert_array_equal(l, lp)
            np.testing.assert_array_equal(r, rp)

    def test_skip_and_range(self, kitti_dir):
        with AsyncFrameLoader(str(kitti_dir), start=1, stop=4, skip=2) as fl:
            idxs = [idx for idx, _, _ in fl]
        assert idxs == [1, 3]

    def test_early_close_is_clean(self, kitti_dir):
        fl = AsyncFrameLoader(str(kitti_dir), queue_depth=1)
        it = iter(fl)
        next(it)
        fl.close()  # must not hang or crash with the worker mid-queue

    def test_missing_dir_yields_nothing(self, tmp_path):
        with AsyncFrameLoader(str(tmp_path / "nope")) as fl:
            assert list(fl) == []
