"""int8 (W8A8) serving-path quantization (models/quantize.py): math
correctness of the quantized linear, end-to-end closeness of the
quantized detector forward, and the fold-before-quantize contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dinov2_od_tpu.config import lightweight_detector_config
from dinov2_od_tpu.models import detector_apply, init_detector_params
from dinov2_od_tpu.models.detector import fold_detector_lora
from dinov2_od_tpu.models.quantize import (
    int8_linear,
    quantize_detector_int8,
    quantize_linear,
)


def test_int8_linear_matches_dequant_reference(rng):
    """int8_linear == the explicit quantize->int-matmul->dequant math,
    and its error vs the fp32 linear is at the per-channel W8A8 level."""
    i, o, n = 64, 96, 32
    w = jnp.asarray(rng.normal(size=(i, o)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n, i)).astype(np.float32))
    qp = quantize_linear({"kernel": w, "bias": b})
    assert qp["kernel_q"].dtype == jnp.int8
    assert qp["w_scale"].shape == (o,)

    y_q = int8_linear(x, qp)
    # Explicit reference of the same scheme.
    xs = np.maximum(np.max(np.abs(np.asarray(x)), -1, keepdims=True) / 127, 1e-8)
    xq = np.clip(np.round(np.asarray(x) / xs), -127, 127)
    ref = (xq @ np.asarray(qp["kernel_q"], np.int32)) * xs * np.asarray(
        qp["w_scale"]
    ) + np.asarray(b)
    np.testing.assert_allclose(np.asarray(y_q), ref, rtol=1e-5, atol=1e-5)

    # Quantization error stays small relative to the fp32 output.
    y_f = x @ w + b
    rel = float(
        jnp.linalg.norm(y_q - y_f) / jnp.linalg.norm(y_f)
    )
    assert rel < 0.02, rel


def test_quantized_detector_close_to_float(rng):
    cfg = lightweight_detector_config(image_size=56)
    params = init_detector_params(jax.random.key(0), cfg)
    params = fold_detector_lora(params, cfg)
    qparams = quantize_detector_int8(params, cfg)

    # All six per-block linears are int8; embeddings/LN/decoder are not.
    for name in ("q", "k", "v", "proj", "fc1", "fc2"):
        assert qparams["backbone"]["blocks"][name]["kernel_q"].dtype == jnp.int8
    assert "kernel" in qparams["backbone"]["patch_embed"]
    assert "kernel_q" not in str(jax.tree_util.tree_structure(qparams["decoder"]))

    images = jnp.asarray(rng.uniform(0, 1, (2, 56, 56, 3)).astype(np.float32))
    out_f = jax.jit(
        lambda p, im: detector_apply(p, cfg, im, deterministic=True)
    )(params, images)
    out_q = jax.jit(
        lambda p, im: detector_apply(p, cfg, im, deterministic=True)
    )(qparams, images)

    rel = float(
        jnp.linalg.norm(out_q["pred_logits"] - out_f["pred_logits"])
        / jnp.linalg.norm(out_f["pred_logits"])
    )
    assert rel < 0.15, rel
    # Boxes are sigmoid outputs in [0, 1]: absolute closeness.
    dbox = float(jnp.max(jnp.abs(out_q["pred_boxes"] - out_f["pred_boxes"])))
    assert dbox < 0.08, dbox


def test_quantize_requires_folded_lora(rng):
    cfg = lightweight_detector_config(image_size=56)
    params = init_detector_params(jax.random.key(0), cfg)
    # Make a LoRA factor non-zero (training state).
    blocks = params["backbone"]["blocks"]
    b = blocks["q"]["lora_B"]
    params["backbone"]["blocks"]["q"]["lora_B"] = b.at[...].set(0.01)
    with pytest.raises(ValueError, match="fold_detector_lora"):
        quantize_detector_int8(params, cfg)


def test_fused_int8_gemm_matches_unfused(rng):
    """The fused Pallas quant-GEMM kernel (ops/int8_gemm.py, the TPU
    wide-K serving path) is bit-identical to the unfused int8 math —
    interpret mode on CPU, fc2-like and non-divisible-M shapes."""
    from dinov2_od_tpu.ops.int8_gemm import fused_int8_linear, int8_gemm_eligible

    # 61: M padding; (64, 4096, 1536): giant swiglu fc2 shape family —
    # exercises the K>2048 block sizing whose former (512, 1024) blocks
    # blew the 16M scoped-vmem budget on the real chip (round 5).
    for m, k, n in ((64, 2048, 256), (61, 2048, 256), (64, 4096, 1536)):
        assert int8_gemm_eligible(m, k, n)
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
        qp = quantize_linear({"kernel": w, "bias": b})
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
        y_f = fused_int8_linear(x, qp, interpret=True)
        y_u = int8_linear(x, qp)
        np.testing.assert_allclose(
            np.asarray(y_f), np.asarray(y_u), rtol=1e-6, atol=1e-6
        )


def test_prefix_int8_training_forward(rng):
    """cfg.backbone.prefix_int8: the frozen (stop-gradiented) prefix
    runs W8A8 during training. Forward stays close to full precision;
    gradients exist only where they should (suffix LoRA + decoder) and
    are finite."""
    import dataclasses

    cfg = lightweight_detector_config(image_size=56)
    cfg_q = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, prefix_int8=True)
    )
    params = init_detector_params(jax.random.key(0), cfg)
    images = jnp.asarray(rng.uniform(0, 1, (2, 56, 56, 3)).astype(np.float32))

    out_f = detector_apply(params, cfg, images, deterministic=True)
    out_q = detector_apply(params, cfg_q, images, deterministic=True)
    rel = float(
        jnp.linalg.norm(out_q["pred_logits"] - out_f["pred_logits"])
        / jnp.linalg.norm(out_f["pred_logits"])
    )
    assert rel < 0.15, rel

    def loss(p):
        out = detector_apply(p, cfg_q, images, deterministic=True)
        return jnp.sum(out["pred_logits"] ** 2) + jnp.sum(out["pred_boxes"])

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # The quantized prefix is stop-gradiented: frozen prefix kernels get
    # exactly-zero grads; the adapted suffix LoRA factors get nonzero.
    k = cfg.backbone.depth - cfg.backbone.lora_last_n_blocks
    gq = g["backbone"]["blocks"]["q"]
    assert float(np.abs(np.asarray(gq["kernel"][:k])).max()) == 0.0
    # (lora_A's grad is zero at init by construction: B is zero-init and
    # dA is proportional to B. lora_B's grad is the live one.)
    assert float(np.abs(np.asarray(gq["lora_B"][k:])).max()) > 0.0


def test_quantized_params_checkpoint_roundtrip(rng, tmp_path):
    """An int8 serving tree survives an Orbax save/restore cycle
    (deploy-once, serve-many: quantize, save, load on the serving host)."""
    from dinov2_od_tpu.train.checkpoint import restore_checkpoint, save_final_params

    cfg = lightweight_detector_config(image_size=56)
    params = fold_detector_lora(
        init_detector_params(jax.random.key(0), cfg), cfg
    )
    qparams = quantize_detector_int8(params, cfg)
    path = save_final_params(str(tmp_path), qparams, name="int8_model")
    restored, _, _, _ = restore_checkpoint(path, qparams, None)
    for a, b in zip(
        jax.tree_util.tree_leaves(qparams), jax.tree_util.tree_leaves(restored)
    ):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_prefix_int8_rejected_under_pipeline(rng):
    """prefix_int8 + pipeline parallelism raises instead of silently
    running the prefix in bf16 (the PP branch has no LoRA-boundary
    split)."""
    import dataclasses

    from dinov2_od_tpu.parallel import create_mesh

    cfg = lightweight_detector_config(image_size=56)
    cfg_q = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, prefix_int8=True)
    )
    mesh = create_mesh(model_parallel_size=4)
    params = init_detector_params(jax.random.key(0), cfg)
    images = jnp.asarray(rng.uniform(0, 1, (4, 56, 56, 3)).astype(np.float32))
    with pytest.raises(ValueError, match="pipeline"):
        detector_apply(
            params, cfg_q, images, deterministic=True, mesh=mesh,
            pipe_axis="model", pipe_microbatches=2,
        )


def test_int8_linear_ste_gradient(rng):
    """Activation gradients flow through int8_linear via the
    straight-through estimator: d/dx of sum(int8_linear(x)) equals the
    dequantized weight's row sums (quant ops treated as identity), and
    the bias gradient is exact. Guards against jnp.round's zero
    gradient silently killing dx (ADVICE r3)."""
    i, o, n = 32, 48, 8
    w = jnp.asarray(rng.normal(size=(i, o)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n, i)).astype(np.float32))
    qp = quantize_linear({"kernel": w, "bias": b})

    dx = jax.grad(lambda xx: int8_linear(xx, qp).sum())(x)
    w_deq = np.asarray(qp["kernel_q"], np.float32) * np.asarray(qp["w_scale"])
    expected = np.broadcast_to(w_deq.sum(axis=1), (n, i))
    np.testing.assert_allclose(np.asarray(dx), expected, rtol=1e-5, atol=1e-5)
    assert float(np.abs(np.asarray(dx)).max()) > 0.0

    # Bias gradient is exact; w_scale's is a defined symbolic zero.
    db = jax.grad(
        lambda bb: int8_linear(x, {**qp, "bias": bb}).sum()
    )(b)
    np.testing.assert_allclose(np.asarray(db), np.full((o,), float(n)), rtol=1e-6)
