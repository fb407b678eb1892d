"""Flash-attention kernel vs the XLA reference path, forward and backward,
in Pallas interpreter mode (CPU). Real-TPU execution is exercised by
bench.py / __graft_entry__.py on hardware."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dinov2_od_tpu.ops.attention import _xla_attention
from dinov2_od_tpu.ops.flash_attention import flash_attention


def _rand_qkv(rng, b, s, h, d, sk=None):
    sk = sk or s
    q = rng.normal(size=(b, s, h, d)).astype(np.float32)
    k = rng.normal(size=(b, sk, h, d)).astype(np.float32)
    v = rng.normal(size=(b, sk, h, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize(
    "b,s,h,d",
    [
        (1, 128, 2, 64),   # aligned
        (2, 257, 3, 64),   # ViT-S/B @224: CLS + 256, ragged
        (1, 130, 2, 64),   # small ragged
    ],
)
def test_forward_matches_xla(rng, b, s, h, d):
    q, k, v = _rand_qkv(rng, b, s, h, d)
    scale = 1.0 / np.sqrt(d)
    ours = np.asarray(
        flash_attention(q, k, v, scale=scale, block_q=128, interpret=True)
    )
    ref = np.asarray(_xla_attention(q, k, v, scale))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_cross_attention_shapes(rng):
    # Sq != Sk (decoder-style cross attention).
    q, k, v = _rand_qkv(rng, 1, 50, 4, 64, sk=256)
    scale = 0.125
    ours = np.asarray(
        flash_attention(q, k, v, scale=scale, block_q=128, interpret=True)
    )
    ref = np.asarray(_xla_attention(q, k, v, scale))
    assert ours.shape == (1, 50, 4, 64)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_backward_matches_xla(rng):
    b, s, h, d = 1, 257, 2, 64
    q, k, v = _rand_qkv(rng, b, s, h, d)
    scale = 1.0 / np.sqrt(d)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, scale=scale, block_q=128, interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_xla(q, k, v):
        o = _xla_attention(q, k, v, scale)
        return jnp.sum(o * jnp.cos(o))

    g_ours = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g_ours, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5,
        ), name


def test_bf16_inputs_fp32_accumulation(rng):
    b, s, h, d = 1, 256, 2, 64
    q, k, v = _rand_qkv(rng, b, s, h, d)
    scale = 1.0 / np.sqrt(d)
    ours = np.asarray(
        flash_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), scale=scale, interpret=True,
        ).astype(jnp.float32)
    )
    ref = np.asarray(_xla_attention(q, k, v, scale))
    # bf16 inputs: ~2-3 decimal digits.
    np.testing.assert_allclose(ours, ref, rtol=3e-2, atol=3e-2)


def test_extreme_logits_stable(rng):
    b, s, h, d = 1, 128, 1, 64
    q, k, v = _rand_qkv(rng, b, s, h, d)
    out = flash_attention(q * 100, k * 100, v, scale=1.0, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_kv_len_padded_network_exact(rng):
    """Whole-network sequence padding: attention on pre-padded q/k/v with
    kv_len must equal attention on the unpadded arrays — forward AND
    gradients, with exactly-zero grads for the padded key rows even when
    the padded rows carry nonzero activations."""
    b, s, h, d = 2, 257, 2, 64
    s_pad = 272
    q, k, v = _rand_qkv(rng, b, s, h, d)
    scale = 1.0 / np.sqrt(d)

    # Padded rows intentionally NONZERO (as after a LayerNorm beta).
    pad_fill = jnp.ones((b, s_pad - s, h, d), jnp.float32) * 0.7
    qp, kp, vp = (jnp.concatenate([x, pad_fill], axis=1) for x in (q, k, v))

    ref = flash_attention(q, k, v, scale=scale, interpret=True)
    out = flash_attention(qp, kp, vp, scale=scale, interpret=True, kv_len=s)
    np.testing.assert_allclose(
        np.asarray(out[:, :s]), np.asarray(ref), rtol=2e-5, atol=2e-5
    )

    # Gradients: cotangent zero on padded rows (as produced by the final
    # slice in the network).
    def loss_ref(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale=scale, interpret=True) ** 2)

    def loss_pad(q, k, v):
        o = flash_attention(q, k, v, scale=scale, interpret=True, kv_len=s)
        return jnp.sum(o[:, :s] ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(loss_pad, argnums=(0, 1, 2))(qp, kp, vp)
    for a, bb in zip(gr, gp):
        np.testing.assert_allclose(
            np.asarray(bb[:, :s]), np.asarray(a), rtol=3e-5, atol=3e-5
        )
        # dk/dv (and dq) of padded rows must be exactly zero.
        assert np.abs(np.asarray(bb[:, s:])).max() == 0.0


@pytest.mark.parametrize(
    "b,s,h,d",
    [
        (2, 257, 2, 64),   # ragged, paired-head lane blocks (g=2)
        (1, 128, 4, 64),   # aligned
        (1, 96, 2, 128),   # g=1 (dh already a lane multiple)
    ],
)
def test_flat_forward_and_grads_match_xla(rng, b, s, h, d):
    """Flat-layout kernels (no BSHD transposes) vs XLA, fwd + bwd."""
    q, k, v = _rand_qkv(rng, b, s, h, d)
    scale = 1.0 / np.sqrt(d)
    ours = np.asarray(
        flash_attention(q, k, v, scale=scale, interpret=True, flat=True)
    )
    ref = np.asarray(_xla_attention(q, k, v, scale))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)

    def loss_flat(q, k, v):
        o = flash_attention(q, k, v, scale=scale, interpret=True, flat=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_xla(q, k, v):
        o = _xla_attention(q, k, v, scale)
        return jnp.sum(o * jnp.cos(o))

    g_ours = jax.grad(loss_flat, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ours, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5
        )


def test_flat_matches_bhsd_paths_exactly(rng):
    """The flat and BHSD kernel families implement identical math — their
    outputs must agree to fp32 roundoff on the same inputs."""
    b, s, h, d = 2, 257, 2, 64
    q, k, v = _rand_qkv(rng, b, s, h, d)
    scale = 1.0 / np.sqrt(d)
    o_flat = np.asarray(
        flash_attention(q, k, v, scale=scale, interpret=True, flat=True)
    )
    o_bhsd = np.asarray(
        flash_attention(q, k, v, scale=scale, interpret=True, flat=False)
    )
    np.testing.assert_allclose(o_flat, o_bhsd, rtol=1e-6, atol=1e-6)


def test_flat_kv_len_padded_network_exact(rng):
    """Flat path under whole-network sequence padding: nonzero padded
    rows, kv_len masking — forward and gradients exact, padded-row
    dk/dv/dq exactly zero."""
    b, s, h, d = 2, 257, 2, 64
    s_pad = 272
    q, k, v = _rand_qkv(rng, b, s, h, d)
    scale = 1.0 / np.sqrt(d)
    pad_fill = jnp.ones((b, s_pad - s, h, d), jnp.float32) * 0.7
    qp, kp, vp = (jnp.concatenate([x, pad_fill], axis=1) for x in (q, k, v))

    ref = flash_attention(q, k, v, scale=scale, interpret=True, flat=True)
    out = flash_attention(
        qp, kp, vp, scale=scale, interpret=True, kv_len=s, flat=True
    )
    np.testing.assert_allclose(
        np.asarray(out[:, :s]), np.asarray(ref), rtol=2e-5, atol=2e-5
    )

    def loss_ref(q, k, v):
        o = flash_attention(q, k, v, scale=scale, interpret=True, flat=True)
        return jnp.sum(o ** 2)

    def loss_pad(q, k, v):
        o = flash_attention(
            q, k, v, scale=scale, interpret=True, kv_len=s, flat=True
        )
        return jnp.sum(o[:, :s] ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(loss_pad, argnums=(0, 1, 2))(qp, kp, vp)
    for a, bb in zip(gr, gp):
        np.testing.assert_allclose(
            np.asarray(bb[:, :s]), np.asarray(a), rtol=3e-5, atol=3e-5
        )
        assert np.abs(np.asarray(bb[:, s:])).max() == 0.0


def test_flat_blocked_backward_long_seq(rng):
    """S=1370 (ViT-L/518): the flat backward splits keys into blocks
    whose padded length exceeds S_pad — the k-block masking and the
    revisited-dq accumulation must stay exact."""
    b, s, h, d = 1, 1370, 2, 64
    q, k, v = _rand_qkv(rng, b, s, h, d)
    scale = 1.0 / np.sqrt(d)

    def loss(q, k, v):
        o = flash_attention(q, k, v, scale=scale, interpret=True, flat=True)
        return jnp.sum(o ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) ** 2)

    g_ours = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(g_ours, g_ref):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=5e-4, atol=5e-4
        )


def test_backward_block_mismatch_no_nan():
    """Regression: at S=1370 (ViT-L/518) the backward's auto-block pads
    the q dim to MORE rows than the forward (different VMEM buffer
    counts), and the saved lse used to be passed through at the
    forward's shorter length — the pallas specs then read past the
    array and dk/dv came back NaN. lse must be normalized to the
    backward's padded length."""
    rng = np.random.default_rng(11)
    b, s, h, d = 1, 1370, 1, 64
    q, k, v = _rand_qkv(rng, b, s, h, d)
    scale = 1.0 / np.sqrt(d)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale=scale, interpret=True) ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in (gq, gk, gv):
        assert np.isfinite(np.asarray(g)).all()

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) ** 2)

    rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, bb in ((gq, rq), (gk, rk), (gv, rv)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=5e-4, atol=5e-4
        )


def _lse_ref(q, k, v, scale, kv_len=None):
    """Naive (o, lse) reference: lse in natural-log space, [B, Sq, H]."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    if kv_len is not None and kv_len < k.shape[1]:
        ids = jnp.arange(k.shape[1])
        s = jnp.where(ids[None, None, None, :] < kv_len, s, -jnp.inf)
    lse = jax.scipy.special.logsumexp(s, axis=-1)
    p = jnp.exp(s - lse[..., None])
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    return o, jnp.transpose(lse, (0, 2, 1))


@pytest.mark.parametrize(
    "h,d,kv_len,flat",
    [
        (4, 32, None, True),    # flat kernel family
        (4, 32, 33, True),      # flat + key masking
        (3, 32, None, False),   # BHSD all-heads family
        (3, 32, 33, False),     # BHSD + key masking
    ],
)
def test_lse_variant_forward_and_grads(rng, h, d, kv_len, flat):
    """flash_attention_lse returns (o, lse) with exact gradients through
    BOTH outputs — the lse cotangent folds into the backward's delta
    term (ring attention's merge differentiates through lse)."""
    from dinov2_od_tpu.ops.flash_attention import flash_attention_lse

    b, s = 2, 40
    q, k, v = _rand_qkv(rng, b, s, h, d)
    scale = 1.0 / np.sqrt(d)

    o, lse = flash_attention_lse(
        q, k, v, scale=scale, interpret=True, kv_len=kv_len, flat=flat
    )
    o_r, lse_r = _lse_ref(q, k, v, scale, kv_len)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_r),
                               rtol=2e-5, atol=2e-5)

    # A loss touching both outputs makes the lse cotangent nonzero.
    def loss(fn):
        def f(q, k, v):
            o, l = fn(q, k, v)
            return jnp.sum(o ** 2) + jnp.sum(jnp.sin(l))
        return f

    g = jax.grad(
        loss(lambda q, k, v: flash_attention_lse(
            q, k, v, scale=scale, interpret=True, kv_len=kv_len, flat=flat
        )),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_r = jax.grad(
        loss(lambda q, k, v: _lse_ref(q, k, v, scale, kv_len)),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b_ in zip(g, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-5, atol=5e-5)


def test_lse_variant_cross_attention_shapes(rng):
    """flash_attention_lse on Sq != Sk (BHSD path): forward and both
    cotangent paths stay exact."""
    from dinov2_od_tpu.ops.flash_attention import flash_attention_lse

    b, sq, sk, h, d = 1, 24, 56, 2, 32
    q, k, v = _rand_qkv(rng, b, sq, h, d, sk=sk)
    scale = 1.0 / np.sqrt(d)
    o, lse = flash_attention_lse(q, k, v, scale=scale, interpret=True)
    o_r, lse_r = _lse_ref(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_r),
                               rtol=2e-5, atol=2e-5)

    def loss(fn):
        def f(q, k, v):
            o, l = fn(q, k, v)
            return jnp.sum(o ** 2) + jnp.sum(jnp.cos(l))
        return f

    g = jax.grad(
        loss(lambda q, k, v: flash_attention_lse(
            q, k, v, scale=scale, interpret=True)), argnums=(0, 1, 2)
    )(q, k, v)
    g_r = jax.grad(
        loss(lambda q, k, v: _lse_ref(q, k, v, scale)), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b_ in zip(g, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-5, atol=5e-5)
