"""Box op tests: hand-computed values + numpy oracle parity."""

import numpy as np
import jax.numpy as jnp

from dinov2_od_tpu.ops import boxes as B


def test_cxcywh_xyxy_roundtrip(rng):
    cxcywh = rng.uniform(0.2, 0.6, size=(7, 4)).astype(np.float32)
    xyxy = B.box_cxcywh_to_xyxy(jnp.asarray(cxcywh))
    back = B.box_xyxy_to_cxcywh(xyxy)
    np.testing.assert_allclose(np.asarray(back), cxcywh, rtol=1e-6, atol=1e-6)


def test_cxcywh_to_xyxy_hand_values():
    box = jnp.array([[0.5, 0.5, 0.2, 0.4]])
    out = np.asarray(B.box_cxcywh_to_xyxy(box))
    np.testing.assert_allclose(out, [[0.4, 0.3, 0.6, 0.7]], atol=1e-7)


def test_box_area():
    b = jnp.array([[0.0, 0.0, 2.0, 3.0], [1.0, 1.0, 1.0, 5.0]])
    np.testing.assert_allclose(np.asarray(B.box_area(b)), [6.0, 0.0])


def test_giou_identical_boxes_is_one():
    b = jnp.array([[0.1, 0.1, 0.5, 0.5]])
    g = np.asarray(B.generalized_box_iou(b, b))
    np.testing.assert_allclose(g, [[1.0]], atol=1e-6)


def test_giou_disjoint_boxes_hand_value():
    # Two unit squares side by side with a 1-unit gap: IoU 0, union 2,
    # enclosing 3x1 = 3 => GIoU = 0 - (3-2)/3 = -1/3.
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[2.0, 0.0, 3.0, 1.0]])
    g = np.asarray(B.generalized_box_iou(a, b))
    np.testing.assert_allclose(g, [[-1.0 / 3.0]], atol=1e-6)


def test_giou_partial_overlap_hand_value():
    # a = [0,0,2,2] area 4; b = [1,1,3,3] area 4; inter = 1, union = 7,
    # enclosing = 9 => GIoU = 1/7 - 2/9.
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[1.0, 1.0, 3.0, 3.0]])
    g = np.asarray(B.generalized_box_iou(a, b))
    np.testing.assert_allclose(g, [[1.0 / 7.0 - 2.0 / 9.0]], atol=1e-6)


def _giou_numpy(b1, b2):
    """Straightforward numpy oracle mirroring the reference torch code
    (dino_detector/utils.py:124-164)."""
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    iou = inter / union
    lt_e = np.minimum(b1[:, None, :2], b2[None, :, :2])
    rb_e = np.maximum(b1[:, None, 2:], b2[None, :, 2:])
    wh_e = np.clip(rb_e - lt_e, 0, None)
    enc = wh_e[..., 0] * wh_e[..., 1]
    return iou - (enc - union) / enc


def test_giou_matches_numpy_oracle(rng):
    a = rng.uniform(0.0, 0.4, size=(13, 2)).astype(np.float32)
    b1 = np.concatenate([a, a + rng.uniform(0.1, 0.5, size=(13, 2))], -1)
    c = rng.uniform(0.0, 0.4, size=(9, 2)).astype(np.float32)
    b2 = np.concatenate([c, c + rng.uniform(0.1, 0.5, size=(9, 2))], -1)
    ours = np.asarray(B.generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(ours, _giou_numpy(b1, b2), rtol=1e-5, atol=1e-5)


def test_elementwise_giou_matches_diag(rng):
    a = rng.uniform(0.0, 0.4, size=(11, 2)).astype(np.float32)
    b1 = np.concatenate([a, a + rng.uniform(0.1, 0.5, size=(11, 2))], -1)
    c = rng.uniform(0.0, 0.4, size=(11, 2)).astype(np.float32)
    b2 = np.concatenate([c, c + rng.uniform(0.1, 0.5, size=(11, 2))], -1)
    pair = np.asarray(B.generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    elem = np.asarray(
        B.elementwise_generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2))
    )
    np.testing.assert_allclose(elem, np.diag(pair), rtol=1e-6, atol=1e-6)


def test_batched_leading_dims(rng):
    b1 = rng.uniform(0.1, 0.9, size=(2, 5, 4)).astype(np.float32)
    b1[..., 2:] = b1[..., :2] + 0.1
    b2 = rng.uniform(0.1, 0.9, size=(2, 3, 4)).astype(np.float32)
    b2[..., 2:] = b2[..., :2] + 0.1
    out = B.generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2))
    assert out.shape == (2, 5, 3)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(out[i]), _giou_numpy(b1[i], b2[i]), rtol=1e-5, atol=1e-5
        )
