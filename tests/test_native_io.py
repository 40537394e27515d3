"""Native CSV loader / block packer vs pandas + NumPy references."""

import numpy as np
import pandas as pd
import pytest

from msckf_tpu.data import native_io


def test_native_builds():
    assert native_io.have_native(), "g++ build of libfastcsv.so failed"


def test_read_numeric_csv(tmp_path):
    rng = np.random.default_rng(0)
    df = pd.DataFrame(rng.normal(size=(57, 7)), columns=[f"c{i}" for i in range(7)])
    p = tmp_path / "x.csv"
    df.to_csv(p, index=False)
    out = native_io.read_numeric_csv(str(p))
    np.testing.assert_allclose(out, df.to_numpy(), rtol=1e-15)


def test_read_space_separated(tmp_path):
    rng = np.random.default_rng(1)
    a = rng.normal(size=(20, 4))
    p = tmp_path / "t.csv"
    np.savetxt(p, a, delimiter=" ", header="a b c d", comments="")
    out = native_io.read_numeric_csv(str(p), sep=" ")
    np.testing.assert_allclose(out, a, rtol=1e-12)


def test_pack_blocks_matches_python(tmp_path):
    rng = np.random.default_rng(2)
    T = 97
    ts = np.arange(T) * 0.005
    gyro = rng.normal(size=(T, 3))
    acc = rng.normal(size=(T, 3))
    cam = np.array([10, 20, 30, 40, 55, 70, 85], dtype=np.int64)
    B = 15
    got = native_io.pack_blocks_native(ts, gyro, acc, cam, B)
    # reference packing in plain python
    bounds = np.append(cam, T)
    for j in range(len(cam)):
        lo, hi = bounds[j], bounds[j + 1]
        n = hi - lo
        np.testing.assert_allclose(got[0][j, :n], ts[lo:hi])
        np.testing.assert_allclose(got[1][j, :n], gyro[lo:hi])
        np.testing.assert_allclose(got[2][j, :n], acc[lo:hi])
        assert got[3][j, :n].all() and not got[3][j, n:].any()
        np.testing.assert_allclose(got[0][j, n:], 0.0)


def test_pack_blocks_overflow():
    ts = np.arange(30) * 1.0
    z = np.zeros((30, 3))
    with pytest.raises(ValueError):
        native_io.pack_blocks_native(ts, z, z, np.array([0], dtype=np.int64), 8)


def test_read_numeric_csvs_threaded(tmp_path):
    """csv_read_many: concurrent multi-file parse matches per-file parses."""
    import numpy as np

    from msckf_tpu.data.native_io import read_numeric_csv, read_numeric_csvs

    rng = np.random.default_rng(5)
    paths = []
    refs = []
    for i in range(9):
        a = rng.normal(size=(200 + 17 * i, 3 + (i % 3)))
        p = tmp_path / f"seq{i}.csv"
        hdr = ",".join(f"c{j}" for j in range(a.shape[1]))
        np.savetxt(p, a, delimiter=",", header=hdr, comments="")
        paths.append(str(p))
        refs.append(a)
    outs = read_numeric_csvs(paths, threads=4)
    for out, ref, p in zip(outs, refs, paths):
        np.testing.assert_allclose(out, read_numeric_csv(p), atol=0)
        np.testing.assert_allclose(out, ref, rtol=1e-12)


def test_load_imu_batch(tmp_path):
    """Threaded multi-sequence IMU loading matches the pandas path."""
    import numpy as np

    from msckf_tpu.data import parser as parsing
    from msckf_tpu.data.synthetic import generate_circle_sequence

    paths = []
    seqs = []
    for i in range(3):
        seq = generate_circle_sequence(rng=np.random.default_rng(i), n_world_points=50)
        d = tmp_path / f"s{i}"
        parsing.save_sequence_csv(seq, str(d))
        paths.append(str(d / "imu.csv"))
        seqs.append(seq)
    out = parsing.load_imu_batch(paths, threads=3)
    for (ts, gyro, acc), seq in zip(out, seqs):
        np.testing.assert_allclose(ts, seq.timestamps, atol=1e-9)
        np.testing.assert_allclose(gyro, seq.imu_gyro, atol=1e-9)
        np.testing.assert_allclose(acc, seq.imu_acc, atol=1e-9)
