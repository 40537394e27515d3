"""prune_path="masked" (branchless window pruning) vs the reference-shaped
lax.cond dispatch (`filter/msckf.py::camera_step`).

The masked form runs `prune_poorest_camera_states` every camera frame with
the victim mask zeroed while the window is unsaturated; by the exact-identity
algebra of the cond-free main update (A=0/c=0 correction is the identity,
`remove_cameras` with no victims is the identity permutation,
`MSCKF.py:710-737` analog) the unsaturated frames are no-ops up to the
rotation re-orthonormalization round-off documented in docs/numerics.md.
Run in float64 so that round-off is ~1e-16 and the comparison is airtight.
"""

import jax
import jax.numpy as jnp
import numpy as np

from msckf_tpu.config import reference_experiment_config
from msckf_tpu.data.stream import build_stream, to_device
from msckf_tpu.data.synthetic import generate_circle_sequence
from msckf_tpu.filter.msckf import make_initial_state, run_sequence


def _run(prune_path, max_ticks=450):
    cfg = reference_experiment_config(
        dtype="float64", f_max=192, u_max=32, k_max=256, desc_dim=16,
        prune_path=prune_path,
    )
    seq = generate_circle_sequence(rng=np.random.default_rng(0))
    st = build_stream(
        cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
        seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores,
        max_ticks=max_ticks,
    )
    std = to_device(st, cfg)
    state0 = make_initial_state(cfg, std.R_init)
    final, pre, out = jax.jit(lambda s, p, f: run_sequence(cfg, s, p, f))(
        state0, std.prefix, std.frames
    )
    return cfg, jax.device_get(final), jax.device_get(out)


def test_masked_prune_matches_cond():
    cfg, final_c, out_c = _run("cond")
    _, final_m, out_m = _run("masked")

    # the sequence must actually saturate the window so the enabled branch
    # (real victims) is exercised, not just the masked no-op frames
    assert int(np.max(out_c.n_cams)) >= cfg.max_camera_states

    # discrete decisions identical: camera window and track population
    # trajectories match frame for frame
    np.testing.assert_array_equal(out_c.n_cams, out_m.n_cams)
    np.testing.assert_array_equal(out_c.n_tracks, out_m.n_tracks)
    for name in ("n_gating_rejected", "n_homography_rejected",
                 "n_epipolar_rejected", "n_track_overflow",
                 "n_update_overflow"):
        assert int(getattr(final_c.diag, name)) == int(getattr(final_m.diag, name))

    # trajectories agree to f64 re-orthonormalization round-off
    np.testing.assert_allclose(out_c.p_WI, out_m.p_WI, atol=1e-9)
    np.testing.assert_allclose(final_c.imu.p_WI, final_m.imu.p_WI, atol=1e-9)
    np.testing.assert_allclose(final_c.P, final_m.P, atol=1e-9)


def test_masked_prune_vmaps():
    """The masked path must lower under vmap (the batched filter's whole
    point: the cond it replaces runs both branches there anyway)."""
    from msckf_tpu.filter.msckf import frame_step

    cfg = reference_experiment_config(
        dtype="float32", f_max=32, u_max=8, k_max=32, desc_dim=10,
        n_cam_slots=6, max_camera_states=4, m_max=6, prune_path="masked",
    )
    seq = generate_circle_sequence(
        rng=np.random.default_rng(1), n_world_points=40, desc_dim=10
    )
    st = build_stream(
        cfg, seq.timestamps, seq.imu_gyro, seq.imu_acc, seq.cam_frame_ticks,
        seq.cam_keypoints, seq.cam_descriptors, seq.cam_scores, max_ticks=60,
    )
    std = to_device(st, cfg)
    state = make_initial_state(cfg, std.R_init)
    B = 3
    states = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), state)
    frame0 = {k: v[0] for k, v in std.frames.items()}
    frames = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), frame0)
    new_states, out = jax.jit(
        jax.vmap(lambda s, f: frame_step(cfg, s, f))
    )(states, frames)
    assert np.all(np.isfinite(jax.device_get(new_states.imu.p_WI)))
