"""Deformable attention: vectorized gather vs a numpy replica of the
reference's per-element bilinear loop
(dino_detector/models/deformable_attention.py:53-183)."""

import numpy as np
import jax
import jax.numpy as jnp

from dinov2_od_tpu.ops.deformable import (
    DeformableParams,
    deformable_attention,
    factor_spatial_shape,
)


def _softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def reference_deformable_np(query, ref, memory, hw_shape, p: DeformableParams,
                            n_heads, n_points):
    """Numpy oracle of the reference forward (deformable_attention.py:53-183),
    including the quadruple sampling loop (:147-170), minus its unused
    `idx < hw` guard (indices are always clipped in-range)."""
    h, w = hw_shape
    b, q, d = query.shape
    hw = memory.shape[1]
    dh = d // n_heads

    offsets = (query @ np.asarray(p.offsets_kernel) + np.asarray(p.offsets_bias))
    offsets = offsets.reshape(b, q, n_heads, n_points, 2)
    weights = (query @ np.asarray(p.weights_kernel) + np.asarray(p.weights_bias))
    weights = _softmax(weights.reshape(b, q, n_heads, n_points), axis=-1)
    values = memory @ np.asarray(p.value_kernel) + np.asarray(p.value_bias)
    values_heads = values.reshape(b, hw, n_heads, dh)

    loc = np.clip(ref[:, :, None, None, :] + offsets, 0, 1)
    sx = loc[..., 0] * (w - 1)
    sy = loc[..., 1] * (h - 1)
    x0 = np.floor(sx).astype(int); y0 = np.floor(sy).astype(int)
    x1, y1 = x0 + 1, y0 + 1
    x0c, x1c = np.clip(x0, 0, w - 1), np.clip(x1, 0, w - 1)
    y0c, y1c = np.clip(y0, 0, h - 1), np.clip(y1, 0, h - 1)
    wx1 = sx - x0; wx0 = 1 - wx1
    wy1 = sy - y0; wy0 = 1 - wy1

    result = np.zeros((b, q, n_heads, n_points, dh), np.float64)
    for bi in range(b):
        for qi in range(q):
            for hi in range(n_heads):
                for pi in range(n_points):
                    i00 = y0c[bi, qi, hi, pi] * w + x0c[bi, qi, hi, pi]
                    i01 = y1c[bi, qi, hi, pi] * w + x0c[bi, qi, hi, pi]
                    i10 = y0c[bi, qi, hi, pi] * w + x1c[bi, qi, hi, pi]
                    i11 = y1c[bi, qi, hi, pi] * w + x1c[bi, qi, hi, pi]
                    result[bi, qi, hi, pi] = (
                        values_heads[bi, i00, hi] * wx0[bi, qi, hi, pi] * wy0[bi, qi, hi, pi]
                        + values_heads[bi, i01, hi] * wx0[bi, qi, hi, pi] * wy1[bi, qi, hi, pi]
                        + values_heads[bi, i10, hi] * wx1[bi, qi, hi, pi] * wy0[bi, qi, hi, pi]
                        + values_heads[bi, i11, hi] * wx1[bi, qi, hi, pi] * wy1[bi, qi, hi, pi]
                    )
    out = (result * weights[..., None]).sum(axis=3).reshape(b, q, d)
    return out @ np.asarray(p.output_kernel) + np.asarray(p.output_bias)


def _random_params(rng, d):
    def u(*shape):
        return rng.normal(size=shape).astype(np.float32) * 0.2

    # Non-zero offsets/weights so the sampling geometry is actually tested.
    return DeformableParams(
        offsets_kernel=jnp.asarray(u(d, 8 * 2 * 2)),
        offsets_bias=jnp.asarray(u(8 * 2 * 2)),
        weights_kernel=jnp.asarray(u(d, 8 * 2)),
        weights_bias=jnp.asarray(u(8 * 2)),
        value_kernel=jnp.asarray(u(d, d)),
        value_bias=jnp.asarray(u(d)),
        output_kernel=jnp.asarray(u(d, d)),
        output_bias=jnp.asarray(u(d)),
    )


def test_matches_reference_loop_oracle(rng):
    b, q, d, h, w = 2, 6, 32, 5, 7
    n_heads, n_points = 8, 2
    params = _random_params(rng, d)
    query = rng.normal(size=(b, q, d)).astype(np.float32)
    ref = rng.uniform(0, 1, size=(b, q, 2)).astype(np.float32)
    memory = rng.normal(size=(b, h * w, d)).astype(np.float32)

    ours = np.asarray(
        deformable_attention(
            jnp.asarray(query), jnp.asarray(ref), jnp.asarray(memory),
            (h, w), params, n_heads, n_points,
        )
    )
    oracle = reference_deformable_np(query, ref, memory, (h, w), params, n_heads, n_points)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)


def test_boundary_sampling_points(rng):
    """Reference points exactly at corners/edges must not read out of
    bounds and must equal the oracle."""
    b, q, d, h, w = 1, 4, 16, 4, 4
    params = _random_params(rng, d)
    query = rng.normal(size=(b, q, d)).astype(np.float32)
    ref = np.array([[[0.0, 0.0], [1.0, 1.0], [0.0, 1.0], [1.0, 0.0]]], np.float32)
    memory = rng.normal(size=(b, h * w, d)).astype(np.float32)
    ours = np.asarray(
        deformable_attention(
            jnp.asarray(query), jnp.asarray(ref), jnp.asarray(memory),
            (h, w), params, 8, 2,
        )
    )
    oracle = reference_deformable_np(query, ref, memory, (h, w), params, 8, 2)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)
    assert np.isfinite(ours).all()


def test_gradients_flow(rng):
    b, q, d, h, w = 1, 3, 16, 4, 4
    params = _random_params(rng, d)
    query = jnp.asarray(rng.normal(size=(b, q, d)).astype(np.float32))
    ref = jnp.asarray(rng.uniform(0.2, 0.8, size=(b, q, 2)).astype(np.float32))
    memory = jnp.asarray(rng.normal(size=(b, h * w, d)).astype(np.float32))

    def f(mem, qr):
        return jnp.sum(
            deformable_attention(qr, ref, mem, (h, w), params, 8, 2) ** 2
        )

    gm, gq = jax.grad(f, argnums=(0, 1))(memory, query)
    assert np.isfinite(np.asarray(gm)).all() and np.abs(np.asarray(gm)).sum() > 0
    assert np.isfinite(np.asarray(gq)).all() and np.abs(np.asarray(gq)).sum() > 0


def test_factor_spatial_shape():
    assert factor_spatial_shape(256) == (16, 16)
    assert factor_spatial_shape(257) == (1, 257)  # reference parity: prime
    assert factor_spatial_shape(12) == (3, 4)
    assert factor_spatial_shape(1369) == (37, 37)  # 518px grid


def test_onehot_path_matches_gather_path(rng):
    from dinov2_od_tpu.ops.deformable import bilinear_gather, bilinear_gather_onehot
    import jax.numpy as jnp

    b, q, h, w, nh, p, dh = 2, 6, 5, 7, 4, 2, 8
    values = jnp.asarray(rng.normal(size=(b, h * w, nh, dh)).astype(np.float32))
    loc_x = jnp.asarray(rng.uniform(-0.4, w - 0.5, size=(b, q, nh, p)).astype(np.float32))
    loc_y = jnp.asarray(rng.uniform(-0.4, h - 0.5, size=(b, q, nh, p)).astype(np.float32))
    a = np.asarray(bilinear_gather(values, loc_x, loc_y, (h, w)))
    o = np.asarray(bilinear_gather_onehot(values, loc_x, loc_y, (h, w)))
    np.testing.assert_allclose(o, a, rtol=1e-5, atol=1e-5)


def test_onehot_path_exact_integer_locations(rng):
    """Integer sampling locations clip both corners onto the same cell;
    the one-hot path must accumulate them identically to the gather path."""
    from dinov2_od_tpu.ops.deformable import bilinear_gather, bilinear_gather_onehot
    import jax.numpy as jnp

    b, q, h, w, nh, p, dh = 1, 3, 4, 4, 2, 2, 4
    values = jnp.asarray(rng.normal(size=(b, h * w, nh, dh)).astype(np.float32))
    loc_x = jnp.asarray(
        rng.integers(0, w, size=(b, q, nh, p)).astype(np.float32)
    )
    loc_y = jnp.asarray(
        rng.integers(0, h, size=(b, q, nh, p)).astype(np.float32)
    )
    a = np.asarray(bilinear_gather(values, loc_x, loc_y, (h, w)))
    o = np.asarray(bilinear_gather_onehot(values, loc_x, loc_y, (h, w)))
    np.testing.assert_allclose(o, a, rtol=1e-5, atol=1e-5)
