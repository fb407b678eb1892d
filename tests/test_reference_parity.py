"""Cross-validation against the ACTUAL reference implementation.

Runs the reference's HungarianMatcher + SetCriterion (imported from its
checkout, not copied) on the same inputs as our on-device criterion and
compares losses. Batch size 1 is used so the reference's batch-0 matching
bug (matching.py:63-64,102 — cost matrix built from the flattened batch)
is inert and both implementations face the same matching problem.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def reference_modules():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    # Stub pycocotools (imported at utils.py:5; irrelevant to the loss).
    if "pycocotools" not in sys.modules:
        pm = types.ModuleType("pycocotools")
        pm.coco = types.ModuleType("pycocotools.coco")
        pm.coco.COCO = object
        pm.cocoeval = types.ModuleType("pycocotools.cocoeval")
        pm.cocoeval.COCOeval = object
        sys.modules["pycocotools"] = pm
        sys.modules["pycocotools.coco"] = pm.coco
        sys.modules["pycocotools.cocoeval"] = pm.cocoeval
    from dino_detector.losses import SetCriterion  # noqa: F401
    from dino_detector.matching import HungarianMatcher  # noqa: F401

    return HungarianMatcher, SetCriterion


def test_criterion_matches_reference_torch(reference_modules, rng):
    HungarianMatcher, SetCriterion = reference_modules
    import jax.numpy as jnp

    from dinov2_od_tpu.config import LossConfig, MatcherConfig
    from dinov2_od_tpu.ops.losses import set_criterion

    q, c, g = 20, 9, 6
    for trial in range(3):
        logits = rng.normal(size=(1, q, c)).astype(np.float32)
        boxes = rng.uniform(0.25, 0.6, size=(1, q, 4)).astype(np.float32)
        labels = rng.integers(0, c, size=(g,)).astype(np.int64)
        tgt = rng.uniform(0.25, 0.6, size=(g, 4)).astype(np.float32)

        # Reference (torch).
        matcher = HungarianMatcher()
        criterion = SetCriterion(
            matcher, num_classes=c,
            weight_dict={"loss_ce": 1.0, "loss_bbox": 5.0, "loss_giou": 2.0},
        )
        ref = criterion(
            {
                "pred_logits": torch.from_numpy(logits),
                "pred_boxes": torch.from_numpy(boxes),
            },
            [{"labels": torch.from_numpy(labels), "boxes": torch.from_numpy(tgt)}],
        )

        # Ours (padded, on device).
        g_pad = g + 4
        labels_p = np.zeros((1, g_pad), np.int32)
        labels_p[0, :g] = labels
        tgt_p = np.zeros((1, g_pad, 4), np.float32)
        tgt_p[0, :g] = tgt
        valid = np.zeros((1, g_pad), bool)
        valid[0, :g] = True
        ours = set_criterion(
            jnp.asarray(logits), jnp.asarray(boxes),
            jnp.asarray(labels_p), jnp.asarray(tgt_p), jnp.asarray(valid),
            matcher_cfg=MatcherConfig(), loss_cfg=LossConfig(), num_classes=c,
        )

        for key in ("loss_ce", "loss_bbox", "loss_giou"):
            np.testing.assert_allclose(
                float(ours[key]), float(ref[key]), rtol=2e-4, atol=1e-5,
            ), f"{key} trial {trial}"


def test_matcher_total_cost_matches_reference_torch(reference_modules, rng):
    """Same optimal assignment cost as the reference matcher (indices may
    differ on ties)."""
    HungarianMatcher, _ = reference_modules
    import jax.numpy as jnp

    from dinov2_od_tpu.config import MatcherConfig
    from dinov2_od_tpu.ops.matching import hungarian_match
    from test_matching import reference_cost_np

    q, c, g = 15, 7, 5
    logits = rng.normal(size=(1, q, c)).astype(np.float32)
    boxes = rng.uniform(0.25, 0.6, size=(1, q, 4)).astype(np.float32)
    labels = rng.integers(0, c, size=(g,)).astype(np.int64)
    tgt = rng.uniform(0.25, 0.6, size=(g, 4)).astype(np.float32)

    matcher = HungarianMatcher()
    (ri, ci), = matcher(
        {
            "pred_logits": torch.from_numpy(logits),
            "pred_boxes": torch.from_numpy(boxes),
        },
        [{"labels": torch.from_numpy(labels), "boxes": torch.from_numpy(tgt)}],
    )
    cost = reference_cost_np(logits[0], boxes[0], labels, tgt, MatcherConfig())
    ref_total = cost[ri.numpy(), ci.numpy()].sum()

    valid = np.ones((1, g), bool)
    res = hungarian_match(
        jnp.asarray(logits), jnp.asarray(boxes),
        jnp.asarray(labels.astype(np.int32))[None],
        jnp.asarray(tgt)[None], jnp.asarray(valid),
    )
    q_of_gt = np.asarray(res.query_of_gt)[0]
    ours_total = sum(cost[q_of_gt[j], j] for j in range(g))
    np.testing.assert_allclose(ours_total, ref_total, rtol=1e-4, atol=1e-4)
