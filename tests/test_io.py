"""I/O layer tests: YML round-trip against the reference schema, CSV header
discovery, IMU average-to-stamp sync, image sequence layouts, GPS conversion."""

import numpy as np
import pytest

from uasl_motion_estimation_tpu.utils import io as uio
from uasl_motion_estimation_tpu.utils.sensors import GpsFrame, ImuData

cv2 = pytest.importorskip("cv2")


@pytest.fixture
def yml_config(tmp_path):
    p = tmp_path / "config.yml"
    p.write_text(
        """%YAML:1.0
---
dataset:
   dir: "/data/seq00"
   type: "stereo"
   gt: "gt.csv"
frames:
   start: 10
   stop: 100
   skip: 2
tracking:
   feats: 300
   window: 7
   ba_rate: 3
calib:
   f1: 718.856
   f2: 718.856
   cu: 607.19
   cv: 185.22
   baseline: 0.5372
   ransac: "true"
   threshold: 1.5
   method: "GN"
appendix: "ir"
"""
    )
    return str(p)


class TestYmlConfig:
    def test_load(self, yml_config):
        cfg = uio.load_yml(yml_config)
        assert cfg.dataset.type == "stereo"
        assert cfg.dataset.dir == "/data/seq00"
        assert cfg.frames.start == 10 and cfg.frames.skip == 2
        assert cfg.tracking.nb_feats == 300 and cfg.tracking.window_size == 7
        assert cfg.calib.fu1 == pytest.approx(718.856)
        assert cfg.calib.cu1 == pytest.approx(607.19)
        assert cfg.calib.baseline == pytest.approx(0.5372)
        assert cfg.calib.inlier_threshold == pytest.approx(1.5)
        assert cfg.appendix == "ir"

    def test_legacy_keys(self, tmp_path):
        p = tmp_path / "legacy.yml"
        p.write_text(
            """%YAML:1.0
---
dataset:
   type: "stereo"
calib:
   fu1: 400.
   fu2: 410.
   fv1: 401.
   fv2: 411.
   cu1: 320.
   cu2: 321.
   cv1: 240.
   cv2: 241.
   baseline: 0.3
"""
        )
        cfg = uio.load_yml(str(p))
        assert cfg.calib.fu1 == 400.0 and cfg.calib.fu2 == 410.0
        assert cfg.calib.cu1 == 320.0 and cfg.calib.cu2 == 321.0
        # defaults kick in (skip=1, feat_cov=1.0; file_IO.h:61-62, 88-89)
        assert cfg.frames.skip == 1
        assert cfg.tracking.feat_cov == 1.0

    def test_missing_file_raises(self):
        with pytest.raises(FileNotFoundError):
            uio.load_yml("/nonexistent/x.yml")


class TestCsv:
    def test_header_discovery(self, tmp_path):
        p = tmp_path / "data.csv"
        p.write_text("# timestamp, x, y, z\n1, 1.0, 2.0, 3.0\n2, 4.0, 5.0, 6.0\n")
        f = uio.CsvFile(str(p))
        assert f.columns == ["timestamp", "x", "y", "z"]
        rows = list(f.rows())
        assert rows[1]["y"] == 5.0

    def test_no_header_raises(self, tmp_path):
        p = tmp_path / "bad.csv"
        p.write_text("1, 2, 3\n")
        with pytest.raises(ValueError):
            uio.CsvFile(str(p))

    def test_imu_average_sync(self, tmp_path):
        """ImuFile::getNextData averages samples up to the stamp
        (file_IO.cpp:252-270)."""
        p = tmp_path / "imu.csv"
        p.write_text(
            "# timestamp, acc_x, acc_y, acc_z, av_x, av_y, av_z\n"
            "1, 1, 0, 0, 0.1, 0, 0\n"
            "2, 2, 0, 0, 0.2, 0, 0\n"
            "3, 3, 0, 0, 0.3, 0, 0\n"
            "10, 9, 0, 0, 0.9, 0, 0\n"
        )
        f = uio.ImuFile(str(p))
        d, n = f.get_next(5)
        assert n == 3
        assert d.acc[0] == pytest.approx(2.0)  # mean of 1,2,3
        assert d.gyr[0] == pytest.approx(0.2)
        assert d.stamp == 3
        d2, n2 = f.get_next(20)
        assert n2 == 1 and d2.acc[0] == pytest.approx(9.0)

    def test_pose_sync_advances_past_stamp(self, tmp_path):
        p = tmp_path / "pose.csv"
        p.write_text("# timestamp, x, y, z\n1, 0, 0, 0\n5, 1, 0, 0\n9, 2, 0, 0\n")
        f = uio.PoseFile(str(p))
        d = f.get_next(4)
        assert d.stamp == 5 and d.position[0] == 1.0


class TestImageSequence:
    def test_kitti_layout_and_crop(self, tmp_path):
        img = np.random.default_rng(0).integers(0, 255, (400, 200), np.uint8)
        for i in range(3):
            cv2.imwrite(str(tmp_path / f"L_{i:06d}.png"), img)
            cv2.imwrite(str(tmp_path / f"R_{i:06d}.png"), img)
        rd = uio.ImageSequenceReader(str(tmp_path))
        left, right = rd.read_frame(0)
        assert left.shape == (374, 200)  # KITTI crop (file_IO.cpp:313-340)
        frames = list(rd)
        assert len(frames) == 3

    def test_generic_layout_with_appendix(self, tmp_path):
        img = np.zeros((40, 60), np.uint8)
        cv2.imwrite(str(tmp_path / "cam0_image00007_ir.png"), img)
        cv2.imwrite(str(tmp_path / "cam1_image00007_ir.png"), img)
        rd = uio.ImageSequenceReader(str(tmp_path), appendix="ir")
        left, right = rd.read_frame(7)
        assert left.shape == (40, 60)

    def test_frame_skip(self, tmp_path):
        img = np.zeros((10, 10), np.uint8)
        for i in range(6):
            cv2.imwrite(str(tmp_path / f"L_{i:06d}.png"), img)
            cv2.imwrite(str(tmp_path / f"R_{i:06d}.png"), img)
        rd = uio.ImageSequenceReader(
            str(tmp_path), uio.FrameConfig(start=0, stop=5, skip=2)
        )
        assert len(list(rd)) == 3


class TestGps:
    def test_origin_is_zero(self):
        f = GpsFrame(origin_lat=52.0, origin_lon=-0.5)
        np.testing.assert_allclose(f.to_cartesian(52.0, -0.5), [0.0, 0.0])

    def test_one_degree_latitude_meters(self):
        f = GpsFrame(origin_lat=52.0, origin_lon=0.0)
        xy = f.to_cartesian(53.0, 0.0)
        # ~111.2-111.4 km/degree latitude at 52N, along +y in frame angle 0
        assert 110_500 < abs(xy[1]) < 111_700

    def test_imu_accumulate_average(self):
        a = ImuData(acc=np.array([1.0, 0, 0]), stamp=1)
        b = ImuData(acc=np.array([3.0, 0, 0]), stamp=2)
        a += b
        a /= 2
        assert a.acc[0] == 2.0 and a.stamp == 2


class TestPcAndControl:
    def test_pc_image_loader(self, tmp_path):
        img = np.full((20, 30), 128, np.uint8)
        for cam in (0, 1):
            for sfx in uio.PC_PLANES:
                cv2.imwrite(str(tmp_path / f"cam{cam}_image00003_{sfx}.png"), img)
        left, right = uio.load_pc_images(str(tmp_path), 3)
        assert left.shape == (4, 20, 30)
        np.testing.assert_allclose(left, 128 / 255.0)

    def test_run_controller_file_commands(self, tmp_path):
        ctl = tmp_path / "control"
        rc = uio.RunController(str(ctl), poll_s=0.01)
        assert rc.checkpoint() is True  # no file -> run
        ctl.write_text("quit")
        assert rc.checkpoint() is False

    def test_run_controller_pause_resume(self, tmp_path):
        import threading
        import time as _t

        ctl = tmp_path / "control"
        ctl.write_text("pause")
        rc = uio.RunController(str(ctl), poll_s=0.01)
        result = {}

        def worker():
            result["ok"] = rc.checkpoint()

        th = threading.Thread(target=worker)
        th.start()
        _t.sleep(0.05)
        assert th.is_alive()  # blocked in pause
        ctl.write_text("resume")
        th.join(timeout=2.0)
        assert result.get("ok") is True


class TestVideoReader:
    """VideoSequenceReader — the reference ImageReader's VIDEO mode
    (file_IO.h:300-421)."""

    @staticmethod
    def _write_videos(tmp_path, n_frames=8, stereo=True, h=32, w=48):
        fourcc = cv2.VideoWriter_fourcc(*"MJPG")
        cams = range(2 if stereo else 1)
        for cam in cams:
            path = str(tmp_path / f"cam{cam}_image.avi")
            vw = cv2.VideoWriter(path, fourcc, 10.0, (w, h), isColor=True)
            if not vw.isOpened():
                pytest.skip("no video codec available in this cv2 build")
            for i in range(n_frames):
                frame = np.full((h, w, 3), 10 * i + cam, np.uint8)
                vw.write(frame)
            vw.release()

    def test_stereo_frames_and_skip(self, tmp_path):
        self._write_videos(tmp_path, n_frames=8)
        rd = uio.VideoSequenceReader(
            str(tmp_path), uio.FrameConfig(start=0, stop=-1, skip=2)
        )
        left, right = rd.read_frame()  # frame index 2
        assert left.shape == (32, 48) and left.dtype == np.float32
        # MJPG is lossy; the constant-value frame should still be close
        assert abs(float(left.mean()) - 20.0) < 4.0
        assert abs(float(right.mean()) - 21.0) < 4.0
        left2, _ = rd.read_frame()  # frame index 4
        assert abs(float(left2.mean()) - 40.0) < 4.0
        rd.close()

    def test_iteration_stops_at_stream_end(self, tmp_path):
        self._write_videos(tmp_path, n_frames=5, stereo=False)
        rd = uio.VideoSequenceReader(
            str(tmp_path), uio.FrameConfig(skip=1), stereo=False
        )
        frames = list(rd)
        assert 3 <= len(frames) <= 5
        assert all(f.ndim == 2 for f in frames)
        rd.close()

    def test_stamp_file_sync(self, tmp_path):
        self._write_videos(tmp_path, n_frames=6, stereo=False)
        stamp = tmp_path / "image_data.csv"
        stamp.write_text(
            "#number,timestamp\n" +
            "".join(f"{i},{1000 + 10 * i}\n" for i in range(6))
        )
        rd = uio.VideoSequenceReader(
            str(tmp_path), uio.FrameConfig(skip=2), stereo=False,
            stamp_file=str(stamp),
        )
        rd.read_frame()
        # skip=2 consumes two stamp rows; the file's numbering is the truth
        # (ImageFile::readData advances one row per call, file_IO.h:355-360)
        assert rd.img_nb == 1 and rd.img_stamp == 1010
        assert rd.is_valid()
        rd.close()


class TestImageStampFile:
    def test_read_next(self, tmp_path):
        p = tmp_path / "image_data.csv"
        p.write_text("#number,timestamp\n0,100\n1,110\n2,120\n")
        f = uio.ImageStampFile(str(p))
        assert f.read_next() == (0, 100)
        assert f.read_next() == (1, 110)
        assert f.read_next() == (2, 120)
        assert f.read_next() is None


class TestGTReader:
    def _write(self, tmp_path):
        """Reference line format (file_IO.h:437-461): stamp, ox, oy, oz, ow,
        x, y, z — orientation in file order (x, y, z, w)."""
        p = tmp_path / "gt.csv"
        lines = ["# timestamp, qx, qy, qz, qw, x, y, z"]
        for i in range(5):
            stamp = 1000 + 10 * i
            lines.append(
                f"{stamp}, 0.0, 0.0, 0.0, 1.0, {float(i)}, {2.0 * i}, 0.5"
            )
        p.write_text("\n".join(lines) + "\n")
        return str(p)

    def test_read_pose_line(self, tmp_path):
        rd = uio.GTReader(self._write(tmp_path))
        stamp, quat, pos = rd.read_pose_line()
        assert stamp == 1000
        np.testing.assert_allclose(quat, [1.0, 0.0, 0.0, 0.0])  # [w,x,y,z]
        np.testing.assert_allclose(pos, [0.0, 0.0, 0.5])
        rd.close()

    def test_get_next_stamped(self, tmp_path):
        """Time-synced retrieval (VERDICT r1 item 10): first pose at/after
        the query stamp, streaming forward."""
        rd = uio.GTReader(self._write(tmp_path))
        d = rd.get_next(1015)
        assert d.stamp == 1020
        np.testing.assert_allclose(d.position, [2.0, 4.0, 0.5])
        d2 = rd.get_next(1020)  # pending entry is not consumed twice
        assert d2.stamp == 1020
        d3 = rd.get_next(1031)
        assert d3.stamp == 1040
        assert rd.get_next(9999) is None
        rd.close()

    def test_pose_at_interpolates(self, tmp_path):
        rd = uio.GTReader(self._write(tmp_path))
        table = rd.read_all()
        d = rd.pose_at(table, 1015)  # halfway between frames 1 and 2
        np.testing.assert_allclose(d.position, [1.5, 3.0, 0.5], atol=1e-9)
        np.testing.assert_allclose(np.linalg.norm(d.orientation), 1.0)
        # clamping outside the range
        assert rd.pose_at(table, 0).stamp == 1000
        assert rd.pose_at(table, 99999).stamp == 1040
        rd.close()

    def test_positions(self, tmp_path):
        rd = uio.GTReader(self._write(tmp_path))
        pos = rd.positions()
        assert pos.shape == (5, 3)
        np.testing.assert_allclose(pos[:, 0], np.arange(5.0))
        rd.close()
