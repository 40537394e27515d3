"""End-to-end VIO on a TartanAir-FORMAT dataset written to disk.

The reference's headline evaluation is TartanAir sequences processed by its
photorealistic generator (`/root/reference/README.md:23-29`,
`photorealistic_generator.py`); the real data is unavailable here (no
egress), so this fixture renders a geometrically consistent boxes scene
along a TartanAir-convention camera trajectory and exercises the ENTIRE
ingestion pipeline the real data would take: trajectory.csv (x y z qx qy qz
qw, space-separated) -> generate_photorealistic (reframe, 10x upsample,
analytic IMU + noise + RW biases, CSV emission) -> Parser -> camera_info.csv
intrinsics -> XFeat extraction on the rendered frames -> filter -> metrics.
"""

import numpy as np
from scipy.spatial.transform import Rotation


def _write_dataset(root, n_cam=45, width=160, height=120, fxy=120.0):
    import os

    import cv2

    from msckf_tpu.data.rendered import (
        make_boxes,
        oblique_extrinsic,
        render_scene_view,
    )

    seq_dir = os.path.join(root, "tartanair", "boxesmini")
    cam_dir = os.path.join(seq_dir, "cam")
    os.makedirs(cam_dir, exist_ok=True)

    # camera orbit over a boxes scene: smooth angular ramp from rest (the
    # reframed GT gets a 3-identity-pose prefix, so starting near-stationary
    # keeps the lerp/Slerp upsample physical)
    tt = np.arange(n_cam) * 0.05
    omega = 2.0 * np.pi / 16.0
    ramp = np.clip(tt / 1.0, 0.0, 1.0)
    ang = np.cumsum(omega * ramp * 0.05)
    radius, cam_h = 2.5, 2.3

    rng = np.random.default_rng(7)
    boxes = make_boxes(rng, n_boxes=24)
    K = np.array([[fxy, 0, width / 2.0], [0, fxy, height / 2.0], [0, 0, 1.0]])
    obl = oblique_extrinsic(35.0)

    R_cam = np.empty((n_cam, 3, 3))
    t_cam = np.empty((n_cam, 3))
    for i in range(n_cam):
        cz, sz = np.cos(ang[i]), np.sin(ang[i])
        yaw = np.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]])
        R_cam[i] = yaw @ obl
        t_cam[i] = [radius * np.cos(ang[i]), radius * np.sin(ang[i]), cam_h]
        img = render_scene_view(
            R_cam[i], t_cam[i], K, width, height, seed=7, boxes=boxes
        )
        cv2.imwrite(os.path.join(cam_dir, f"{i:05d}.png"),
                    img.astype(np.uint8))

    # TartanAir trajectory format: space-separated x y z qx qy qz qw rows
    # (header row present, column names ignored by the loader)
    q = Rotation.from_matrix(R_cam).as_quat()  # x, y, z, w
    rows = np.concatenate([t_cam, q], axis=1)
    np.savetxt(os.path.join(seq_dir, "trajectory.csv"), rows,
               header="x y z qx qy qz qw", comments="")

    # per-dataset intrinsics, read by the runner (`main.py:71-79` analog)
    with open(os.path.join(root, "tartanair", "camera_info.csv"), "w") as f:
        f.write("fx,fy,px,py,w,h\n")
        f.write(f"{fxy},{fxy},{width/2.0},{height/2.0},{width},{height}\n")
    return seq_dir


def test_tartanair_format_pipeline(tmp_path):
    from msckf_tpu.runner import main

    _write_dataset(str(tmp_path))
    m = main([
        "--source", "tartanair", "--sequence", "boxesmini",
        "--data_root", str(tmp_path), "--noise_level", "low",
        "--max_frames", "1000", "--refine_subpix",
    ])
    # the full pipeline must produce a usable trajectory on format-true data
    assert np.all(np.isfinite(m.ate))
    final_ate = float(np.linalg.norm(m.ate[-1]))  # ate is (T, 3)
    assert final_ate < 0.5, f"tartanair-format VIO diverged: {final_ate} m"
    # and the generated dataset must be on disk in the reference layout
    import os
    for f in ("imu.csv", "imu_gt.csv", "transforms_gt.csv", "camera.csv"):
        assert os.path.isfile(tmp_path / "tartanair" / "boxesmini" / f)
