"""Frozen front-end benchmark: the fixture is immutable, the weights must hold.

Round-3 verdict (weak #4): the weights-quality eval was defined by code, so
in-round changes to the texture/homography distribution silently remapped old
checkpoints to new numbers ("weights improved" was unfalsifiable). The fix
(`models/frontend_eval.py`): the evaluation pair set is a committed data
artifact whose SHA-256 is pinned HERE. Improving the weights means beating
the gates below on the UNCHANGED fixture; revising the benchmark means adding
a `frontend_eval_v2.npz`, never regenerating v1.

Reference context: the reference evaluates the upstream-pretrained XFeat
(`/root/reference/src/msckf/FeatureExtractor.py:13-18`); with zero egress the
from-scratch self-supervised artifact is measured against this yardstick.
"""

import os

import numpy as np
import pytest

from msckf_tpu.models import frontend_eval as fe

WEIGHTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "weights", "xfeat_selfsup.npz")

# Never update this hash. A new benchmark is a new file (v2), reported
# alongside v1 — that is the whole point of the fixture.
FIXTURE_V1_SHA256 = "c64cbe2c6d36e7650b633cd19844d8a84ad26dd58ab83f828e29aa0e90bbbff3"

# Committed-artifact scores on the frozen fixture (exact values recorded at
# freeze time, round 4). Gates sit just below to absorb cross-platform f32
# reduction-order jitter, nothing more. RAISE these as the weights improve;
# never lower them.
#   v4 (round 2/3 artifact): hard 0.5368 (103.9 matches/pair), mild 0.5689
#   (114.9 matches/pair)
#   v5 (round 5: H-consistent NMS teacher, 1600-pair pool, two-stage run,
#   best-checkpoint on hard): hard 0.6331 (69 m/p), mild 0.5536 (76 m/p) —
#   CPU numbers; the TPU-side selection value was 0.644 (backend f32
#   reduction-order drift). Mild traded ~1.5pt for +9.6pt hard: the
#   H-consistent teacher optimizes cross-view repeatability under LARGE
#   viewpoint change, which is what VIO matching under motion sees.
GATE_HARD = 0.60
GATE_MILD = 0.52


def test_fixture_is_frozen():
    assert os.path.exists(fe.FIXTURE_V1), "frozen eval fixture missing"
    assert fe.fixture_sha256() == FIXTURE_V1_SHA256, (
        "frontend_eval_v1.npz changed — the frozen benchmark must NEVER be "
        "regenerated; add a v2 fixture instead"
    )


def test_fixture_contents_shape():
    data = np.load(fe.FIXTURE_V1)
    for pre in ("hard", "mild"):
        assert data[f"{pre}_img1"].shape == (8, 256, 256)
        assert data[f"{pre}_img2"].shape == (8, 256, 256)
        assert data[f"{pre}_H"].shape == (8, 3, 3)
    assert int(data["top_k"]) == 200
    assert float(data["tol_px"]) == 3.0


@pytest.mark.skipif(not os.path.exists(WEIGHTS), reason="no trained weights artifact")
def test_committed_weights_hold_frozen_gates():
    from msckf_tpu.models.train_xfeat import load_npz_params

    variables = load_npz_params(WEIGHTS)
    hard_prec, hard_n = fe.frozen_match_precision(variables, hard=True)
    mild_prec, mild_n = fe.frozen_match_precision(variables, hard=False)
    assert hard_prec >= GATE_HARD, (
        f"hard-eval regression on the frozen fixture: {hard_prec:.4f} < {GATE_HARD}"
    )
    assert mild_prec >= GATE_MILD, (
        f"mild-eval regression on the frozen fixture: {mild_prec:.4f} < {GATE_MILD}"
    )
    # a match-starved detector can score high precision on 5 matches; require
    # real match density too
    assert hard_n >= 60, f"too few matches/pair on hard eval: {hard_n}"
    assert mild_n >= 60, f"too few matches/pair on mild eval: {mild_n}"
