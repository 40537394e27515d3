"""End-to-end pipeline tests beyond the circle fixture: classic-preset
golden parity, and the full photorealistic path (raw trajectory -> synthetic
IMU -> images -> XFeat -> filter) as executed by the CLI runner."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from msckf_tpu import reference_experiment_config
from msckf_tpu.data.synthetic import generate_classic_sequence


def test_classic_preset_golden_parity():
    """Golden-trace parity on the classic rounded-rectangle trajectory —
    different motion profile, longer straight segments (low parallax)."""
    from tests.oracle.driver import run_oracle_loop
    from tests.test_parity import _flatten_tick_outputs, _run_tpu

    seq = generate_classic_sequence(rng=np.random.default_rng(1))
    cfg = reference_experiment_config(dtype="float64", f_max=512, u_max=64, k_max=512)
    T = 500
    final, out = _run_tpu(cfg, seq, T)
    oracle, ref = run_oracle_loop(
        cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
        seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores, T,
    )
    np.testing.assert_array_equal(out["n_cams"], ref["n_cams"])
    np.testing.assert_array_equal(out["n_tracks"], ref["n_feats"])
    np.testing.assert_allclose(out["p_WI"], ref["p"], atol=1e-7)
    np.testing.assert_allclose(out["R_WI"], ref["R"], atol=1e-7)


def test_photorealistic_pipeline_with_xfeat(tmp_path):
    """The tartanair source path end-to-end: raw trajectory.csv + rendered
    images -> photorealistic generator -> XFeat extraction (random weights)
    -> filter scan. Validates plumbing, not accuracy (untrained CNN)."""
    cv2 = pytest.importorskip("cv2")

    rng = np.random.default_rng(5)
    root = tmp_path / "tartanair"
    seqdir = root / "P001"
    (seqdir / "cam").mkdir(parents=True)

    # camera_info.csv like the reference layout (`main.py:71-78`)
    import pandas as pd

    # deliberately NON-default intrinsics: the test asserts they reach the
    # filter config (round-1 VERDICT gap: camera_info.csv was parsed by the
    # reference but ignored by the rebuilt runner)
    pd.DataFrame(
        [{"fx": 200.0, "fy": 190.0, "px": 318.0, "py": 242.0, "w": 640, "h": 480,
          "R00": 0, "R01": 0, "R02": 1, "R10": -1, "R11": 0, "R12": 0,
          "R20": 0, "R21": -1, "R22": 0}]
    ).to_csv(root / "camera_info.csv", index=False)

    # smooth raw trajectory (camera frame, TartanAir format: x y z qx qy qz qw)
    n = 14
    t = np.cumsum(np.tile([[0.02, 0.0, 0.0]], (n, 1)), axis=0)
    q = Rotation.from_euler("xyz", np.cumsum(rng.normal(size=(n, 3)) * 0.01, axis=0)).as_quat()
    rows = np.hstack([t, q])
    np.savetxt(seqdir / "trajectory.csv", rows, fmt="%.9f", delimiter=" ",
               header="x y z qx qy qz qw", comments="")

    # textured images so XFeat has something to look at
    base = (rng.uniform(0, 255, size=(480, 640)).astype(np.uint8))
    base = cv2.GaussianBlur(base, (0, 0), 3)
    for i in range(n):
        img = np.roll(base, i * 3, axis=1)
        cv2.imwrite(str(seqdir / "cam" / f"{i:05d}.png"), img)

    from msckf_tpu.runner import main

    m = main(
        [
            "--source", "tartanair", "--sequence", "P001",
            "--max_frames", "60", "--noise_level", "low",
            "--dtype", "float64", "--data_root", str(tmp_path),
            "--log_images",
        ]
    )
    assert np.isfinite(m.mean_rte)
    # camera_info.csv intrinsics reached the filter config
    assert m.cfg.K[0][0] == 200.0 and m.cfg.K[1][1] == 190.0
    assert m.cfg.K[0][2] == 318.0 and m.cfg.K[1][2] == 242.0
    # XFeat descriptors sized the buffers (64-d, not the synthetic 10-d)
    assert m.cfg.desc_dim == 64
    assert set(m.diag) >= {"n_track_overflow", "n_update_overflow"}
    # --log_images produced per-frame overlays
    dbg = root / "P001" / "low_noise" / "debug_images"
    assert dbg.is_dir() and len(list(dbg.glob("*.png"))) > 3
