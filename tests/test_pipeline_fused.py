"""Fused image-in pipeline (msckf_tpu/pipeline.py) == CNN-then-filter.

The fused program must be numerically identical to running
``detect_and_compute`` and ``frame_step`` as separate programs — same ops,
one trace. Also pins the scanned image-sequence form against per-frame calls.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from msckf_tpu.config import reference_experiment_config
from msckf_tpu.filter.msckf import frame_step, make_initial_state
from msckf_tpu.models.xfeat import detect_and_compute, init_params
from msckf_tpu.pipeline import fused_frame_step, run_sequence_images

WEIGHTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "weights", "xfeat_selfsup.npz")


def _cfg(**kw):
    kw.setdefault("dtype", "float32")
    kw.setdefault("desc_dim", 64)
    kw.setdefault("f_max", 96)
    kw.setdefault("u_max", 16)
    kw.setdefault("k_max", 64)
    kw.setdefault("max_camera_states", 6)
    kw.setdefault("n_cam_slots", 7)
    kw.setdefault("m_max", 7)
    return reference_experiment_config(**kw)


def _params():
    if os.path.exists(WEIGHTS):
        from msckf_tpu.models.train_xfeat import load_npz_params

        return load_npz_params(WEIGHTS)
    return init_params(jax.random.key(0))


def _image(rng, size=96):
    from msckf_tpu.models.selfsup import random_texture

    return jnp.asarray(random_texture(rng, size))


def _imu_block(t0, n=3):
    ts = t0 + 0.005 * (1 + np.arange(n))
    return dict(
        imu_ts=jnp.asarray(ts, jnp.float32),
        imu_gyro=jnp.asarray(np.tile([0.01, -0.02, 0.005], (n, 1)), jnp.float32),
        imu_acc=jnp.asarray(np.tile([0.05, 0.0, 9.81], (n, 1)), jnp.float32),
        imu_valid=jnp.ones(n, bool),
    )


def test_fused_equals_two_step():
    cfg = _cfg()
    params = _params()
    rng = np.random.default_rng(0)
    img = _image(rng)
    top_k = 48

    state = make_initial_state(cfg, R_init=np.eye(3))
    blk = _imu_block(0.0)

    fused_state, fused_out = jax.jit(
        lambda s, im, b: fused_frame_step(cfg, params, s, im, b, top_k=top_k)
    )(state, img, blk)

    kp, desc, score, valid = jax.jit(
        lambda p, im: detect_and_compute(p, im, top_k=top_k)
    )(params, img)
    frame = dict(blk, kp=kp, desc=desc, score=score, kp_valid=valid)
    ref_state, ref_out = jax.jit(
        lambda s, f: frame_step(cfg, s, f, assume_camera=True)
    )(state, frame)

    assert int(jnp.sum(valid)) > 0 or not os.path.exists(WEIGHTS)
    np.testing.assert_allclose(
        np.asarray(fused_state.imu.p_WI), np.asarray(ref_state.imu.p_WI),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(fused_state.P), np.asarray(ref_state.P), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(fused_state.tracks.valid), np.asarray(ref_state.tracks.valid)
    )
    np.testing.assert_allclose(
        np.asarray(fused_out.p_WI), np.asarray(ref_out.p_WI), rtol=1e-6, atol=1e-7
    )


def test_scanned_images_equal_per_frame_calls():
    cfg = _cfg()
    params = _params()
    rng = np.random.default_rng(1)
    C = 3
    imgs = jnp.stack([_image(rng) for _ in range(C)])
    top_k = 32

    blocks = [_imu_block(0.05 * j + 0.005) for j in range(C)]
    imu_frames = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    prefix = dict(
        imu_ts=jnp.asarray([0.005], jnp.float32),
        imu_gyro=jnp.zeros((1, 3), jnp.float32),
        imu_acc=jnp.asarray([[0.0, 0.0, 9.81]], jnp.float32),
        imu_valid=jnp.ones(1, bool),
        pre_init=jnp.zeros(1, bool),
    )

    state0 = make_initial_state(cfg, R_init=np.eye(3))
    final, pre_out, outs = jax.jit(
        lambda s, pre, fr, im: run_sequence_images(
            cfg, params, s, pre, fr, im, top_k=top_k
        )
    )(state0, prefix, imu_frames, imgs)

    from msckf_tpu.filter.msckf import propagate_prefix

    st, _ = jax.jit(lambda s, p: propagate_prefix(cfg, s, p))(state0, prefix)
    step = jax.jit(
        lambda s, im, b: fused_frame_step(cfg, params, s, im, b, top_k=top_k)
    )
    for j in range(C):
        st, _ = step(st, imgs[j], blocks[j])

    np.testing.assert_allclose(
        np.asarray(final.imu.p_WI), np.asarray(st.imu.p_WI), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(final.P), np.asarray(st.P), rtol=1e-5, atol=1e-6
    )

    # cnn_chunk that does NOT divide C: the stage pads the image stack with
    # zero frames, runs chunked, slices back — bitwise equal to unchunked
    final_c, _, outs_c = jax.jit(
        lambda s, pre, fr, im: run_sequence_images(
            cfg, params, s, pre, fr, im, top_k=top_k, cnn_chunk=2
        )
    )(state0, prefix, imu_frames, imgs)
    np.testing.assert_array_equal(np.asarray(final_c.P), np.asarray(final.P))
    np.testing.assert_array_equal(
        np.asarray(outs_c.p_WI), np.asarray(outs.p_WI)
    )
