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
