"""Smoke tests for the visualization helpers (matplotlib backend)."""

import numpy as np
from scipy.spatial.transform import Rotation

from msckf_tpu.utils.viz import Canvas3D, CameraImageCanvas, HAVE_RERUN


def test_camera_canvas(tmp_path):
    c = CameraImageCanvas()
    c.add_points(np.array([[100.0, 100.0], [300.0, 200.0]]), labels=[1, 2])
    c.add_covariance_ellipse(np.array([320.0, 240.0]), np.array([[40.0, 10.0], [10.0, 20.0]]))
    out = tmp_path / "cam.png"
    c.save(str(out))
    assert out.stat().st_size > 0


def test_canvas3d(tmp_path):
    c = Canvas3D(x_range=[-5, 5], y_range=[-5, 5], z_range=[0, 5])
    c.add_points(np.random.default_rng(0).normal(size=(50, 3)))
    R = Rotation.from_euler("xyz", [0.1, 0.2, 0.3]).as_matrix()
    c.add_pose(R, np.zeros(3))
    K = np.array([[180.0, 0, 320], [0, 180, 240], [0, 0, 1]])
    c.add_camera_frustum(R, np.array([1.0, 0, 1.0]), K, 640, 480)
    out = tmp_path / "world.png"
    c.save(str(out))
    assert out.stat().st_size > 0


def test_rerun_gated():
    # rerun is not installed in this image; the module must import anyway
    assert HAVE_RERUN in (True, False)
