"""Ring attention vs the single-device XLA path on the 8-virtual-device
CPU mesh: forward and backward exactness, gradient flow through ppermute."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dinov2_od_tpu.ops.attention import _xla_attention
from dinov2_od_tpu.ops.ring_attention import ring_attention
from dinov2_od_tpu.parallel import create_mesh


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(model_parallel_size=1)  # ('data': 8, 'model': 1)


def _qkv(rng, b, s, h, d):
    return tuple(
        jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        for _ in range(3)
    )


def test_forward_matches_full_attention(rng, mesh):
    b, s, h, d = 2, 128, 2, 16  # s = 8 shards of 16
    q, k, v = _qkv(rng, b, s, h, d)
    scale = 1.0 / np.sqrt(d)

    sharding = NamedSharding(mesh, P(None, "data", None, None))
    qs, ks, vs = (jax.device_put(x, sharding) for x in (q, k, v))

    out = ring_attention(qs, ks, vs, scale=scale, mesh=mesh)
    ref = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    # Output keeps the sequence sharding.
    assert out.sharding.spec == P(None, "data", None, None)


def test_backward_matches_full_attention(rng, mesh):
    b, s, h, d = 1, 64, 2, 8
    q, k, v = _qkv(rng, b, s, h, d)
    scale = 1.0 / np.sqrt(d)
    sharding = NamedSharding(mesh, P(None, "data", None, None))
    qs, ks, vs = (jax.device_put(x, sharding) for x in (q, k, v))

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, scale=scale, mesh=mesh) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(qs, ks, vs)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ring, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-5, atol=5e-5
        )


@pytest.mark.parametrize("block_size", [5, 16])
def test_blockwise_inner_loop_exact(rng, mesh, block_size):
    """Forcing the inner loop into multiple key sub-blocks (including a
    non-divisible width -> intra-shard padding) must not change the
    result or its gradients."""
    b, s, h, d = 1, 128, 2, 8  # shard = 16 keys -> 4x5(+pad) or 1x16 blocks
    q, k, v = _qkv(rng, b, s, h, d)
    scale = 1.0 / np.sqrt(d)
    sharding = NamedSharding(mesh, P(None, "data", None, None))
    qs, ks, vs = (jax.device_put(x, sharding) for x in (q, k, v))

    out = ring_attention(
        qs, ks, vs, scale=scale, mesh=mesh, block_size=block_size
    )
    ref = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )

    def loss_ring(q, k, v):
        return jnp.sum(
            ring_attention(
                q, k, v, scale=scale, mesh=mesh, block_size=block_size
            ) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(qs, ks, vs)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ring, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-5, atol=5e-5
        )


def test_blockwise_with_valid_len(rng, mesh):
    """Sub-blocking composes with the global valid_len key mask: padded
    global positions stay masked regardless of which sub-block they land
    in after rotation."""
    b, s_real, h, d = 1, 100, 2, 8
    q, k, v = _qkv(rng, b, s_real, h, d)
    scale = 1.0 / np.sqrt(d)
    # Pad to a shard multiple (8 devices): 100 -> 104.
    s_pad = 104
    padw = ((0, 0), (0, s_pad - s_real), (0, 0), (0, 0))
    qp, kp, vp = (jnp.pad(x, padw) for x in (q, k, v))
    sharding = NamedSharding(mesh, P(None, "data", None, None))
    qs, ks, vs = (jax.device_put(x, sharding) for x in (qp, kp, vp))

    out = ring_attention(
        qs, ks, vs, scale=scale, mesh=mesh, valid_len=s_real, block_size=5
    )
    ref = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(out)[:, :s_real], np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_flash_impl_forward_and_backward(rng, mesh):
    """impl='flash' (Pallas kernel per ring step, interpret mode on the
    CPU mesh) matches the single-device XLA path, gradients included."""
    b, s, h, d = 1, 128, 2, 16  # 8 shards of 16; BHSD kernel path (h=2)
    q, k, v = _qkv(rng, b, s, h, d)
    scale = 1.0 / np.sqrt(d)
    sharding = NamedSharding(mesh, P(None, "data", None, None))
    qs, ks, vs = (jax.device_put(x, sharding) for x in (q, k, v))

    out = ring_attention(
        qs, ks, vs, scale=scale, mesh=mesh, impl="flash", interpret=True
    )
    ref = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    assert out.sharding.spec == P(None, "data", None, None)

    def loss_ring(q, k, v):
        return jnp.sum(
            ring_attention(
                q, k, v, scale=scale, mesh=mesh, impl="flash",
                interpret=True,
            ) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(qs, ks, vs)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ring, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-5, atol=5e-5
        )


def test_flash_impl_flat_kernel_path(rng, mesh):
    """Head count divisible into 128-lane groups -> the flash impl's
    local step takes the FLAT kernel family (the TPU default at model
    scale)."""
    b, s, h, d = 1, 128, 4, 32  # g = 128/gcd(32,128) = 4 divides h
    q, k, v = _qkv(rng, b, s, h, d)
    scale = 1.0 / np.sqrt(d)
    sharding = NamedSharding(mesh, P(None, "data", None, None))
    qs, ks, vs = (jax.device_put(x, sharding) for x in (q, k, v))

    out = ring_attention(
        qs, ks, vs, scale=scale, mesh=mesh, impl="flash", interpret=True
    )
    ref = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )

    def loss_ring(q, k, v):
        return jnp.sum(
            ring_attention(
                q, k, v, scale=scale, mesh=mesh, impl="flash",
                interpret=True,
            ) ** 2
        )

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(qs, ks, vs)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ring, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-5, atol=5e-5
        )


@pytest.mark.parametrize("s_real", [100, 96])
def test_flash_impl_valid_len(rng, mesh, s_real):
    """The flash impl's three static key-mask cases (fully-valid /
    straddling / fully-masked shard) reproduce the global valid_len mask,
    including s_real=96 where the boundary falls exactly between shards
    (no straddling shard) and shard 7 (keys 96..103) is fully masked."""
    b, h, d = 1, 2, 16
    q, k, v = _qkv(rng, b, s_real, h, d)
    scale = 1.0 / np.sqrt(d)
    s_pad = 104 if s_real == 100 else 96  # shard multiple of 8
    padw = ((0, 0), (0, s_pad - s_real), (0, 0), (0, 0))
    qp, kp, vp = (jnp.pad(x, padw) for x in (q, k, v))
    sharding = NamedSharding(mesh, P(None, "data", None, None))
    qs, ks, vs = (jax.device_put(x, sharding) for x in (qp, kp, vp))

    out = ring_attention(
        qs, ks, vs, scale=scale, mesh=mesh,
        valid_len=s_real if s_pad != s_real else None,
        impl="flash", interpret=True,
    )
    ref = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(out)[:, :s_real], np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_flash_impl_valid_len_grads(rng, mesh):
    """Gradients through the masked flash path: padded key/value rows get
    exactly-zero gradients; real rows match the unpadded XLA reference."""
    b, s_real, h, d = 1, 100, 2, 16
    q, k, v = _qkv(rng, b, s_real, h, d)
    scale = 1.0 / np.sqrt(d)
    s_pad = 104
    padw = ((0, 0), (0, s_pad - s_real), (0, 0), (0, 0))
    qp, kp, vp = (jnp.pad(x, padw) for x in (q, k, v))
    sharding = NamedSharding(mesh, P(None, "data", None, None))
    qs, ks, vs = (jax.device_put(x, sharding) for x in (qp, kp, vp))

    def loss_ring(q, k, v):
        out = ring_attention(
            q, k, v, scale=scale, mesh=mesh, valid_len=s_real,
            impl="flash", interpret=True,
        )
        return jnp.sum(out[:, :s_real] ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(qs, ks, vs)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ring, g_ref):
        a = np.asarray(a)
        np.testing.assert_allclose(
            a[:, :s_real], np.asarray(b_), rtol=5e-5, atol=5e-5
        )
        np.testing.assert_allclose(a[:, s_real:], 0.0, atol=5e-6)


def test_flash_impl_dp_x_cp(rng):
    """Flash impl under a DP x CP mesh: batch sharded over 'data',
    sequence over 'model' — compute stays data-sharded (batch_axis) and
    results match the single-device reference."""
    dpcp = create_mesh(model_parallel_size=4)  # data 2 x model 4
    b, s, h, d = 2, 64, 2, 16
    q, k, v = _qkv(rng, b, s, h, d)
    scale = 1.0 / np.sqrt(d)
    sharding = NamedSharding(dpcp, P("data", "model", None, None))
    qs, ks, vs = (jax.device_put(x, sharding) for x in (q, k, v))

    out = ring_attention(
        qs, ks, vs, scale=scale, mesh=dpcp, axis="model",
        batch_axis="data", impl="flash", interpret=True,
    )
    ref = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    assert out.sharding.spec == P("data", "model", None, None)


def test_jit_composes_with_mesh(rng, mesh):
    b, s, h, d = 1, 64, 2, 8
    q, k, v = _qkv(rng, b, s, h, d)
    sharding = NamedSharding(mesh, P(None, "data", None, None))
    qs = jax.device_put(q, sharding)
    ks = jax.device_put(k, sharding)
    vs = jax.device_put(v, sharding)
    f = jax.jit(lambda a, b_, c: ring_attention(a, b_, c, scale=0.3, mesh=mesh))
    out = f(qs, ks, vs)
    ref = _xla_attention(q, k, v, 0.3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
