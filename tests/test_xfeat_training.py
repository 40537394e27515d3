"""Self-supervised XFeat training: the loop learns, and the committed
weights artifact (when present) passes the matching-precision gate."""

import os

import numpy as np
import pytest

WEIGHTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "weights", "xfeat_selfsup.npz")


def test_training_reduces_loss():
    """A short CPU run must reduce the total loss (descriptor InfoNCE +
    keypoint distillation + reliability regression)."""
    import jax
    import jax.numpy as jnp
    import optax

    from msckf_tpu.models.train_xfeat import PairPool, batch_loss, make_train_step
    from msckf_tpu.models.xfeat import XFeatModel

    size, batch, steps = 128, 2, 25
    rng = np.random.default_rng(3)
    model = XFeatModel(train=True)
    variables = model.init(jax.random.key(0), jnp.zeros((1, size, size, 1)))
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)
    step = make_train_step(tx, size)

    pool = PairPool(rng, 8, size)
    losses = []
    for i in range(steps):
        i1, i2, H, l1, l2 = pool.draw(batch)
        params, batch_stats, opt_state, loss, _ = step(
            params, batch_stats, opt_state,
            jnp.asarray(i1), jnp.asarray(i2), jnp.asarray(H),
            jnp.asarray(l1), jnp.asarray(l2),
        )
        losses.append(float(loss))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(last)
    assert last < first * 0.8, f"no learning: {first:.3f} -> {last:.3f}"


@pytest.mark.skipif(not os.path.exists(WEIGHTS), reason="no trained weights artifact")
def test_trained_weights_matching_gate():
    """The committed self-supervised weights must match held-out warped pairs
    far above the random-weight baseline (~0 precision, <5 matches/pair).

    Yardstick note: the eval distribution changed in round 3 (the
    ray-traced-boxes texture family joined `random_texture`, and
    `random_homography` gained the rotation/scale similarity prefactor), so
    precision numbers are not comparable across that change. The committed
    v4 artifact measures on the CURRENT distribution: 0.569@3px mild /
    0.537@3px full-augmentation (seed 999, 8 pairs), and 0.434@3px with ~85
    matches/pair on this test's exact configuration (seed 123, 4 pairs,
    mild). Gates sit below with margin. (Upstream-pretrained weights would
    score higher — this artifact's job is a *functional* real-image
    front-end, proven by the rendered-sequence VIO e2e,
    `test_rendered_e2e.py`.)"""
    from msckf_tpu.models.train_xfeat import load_npz_params, match_accuracy

    variables = load_npz_params(WEIGHTS)
    prec, n_matches = match_accuracy(
        variables, np.random.default_rng(123), n_pairs=4, size=256, top_k=200
    )
    assert prec >= 0.35, f"matching precision {prec:.3f} below gate"
    assert n_matches >= 60, f"too few matches/pair: {n_matches:.0f}"
