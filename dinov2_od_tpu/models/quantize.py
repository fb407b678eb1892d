"""Post-training int8 quantization (W8A8) for the serving path.

TPU-native inference feature beyond the reference's surface (the
reference serves fp32 torch, dino_detector/models/detector.py): the v5e
MXU executes s8 x s8 -> s32 matmuls at twice the bf16 rate, and the
backbone forward is ~93% weight GEMMs (qkv/proj/fc1/fc2), so quantizing
just those six linears per block approaches a 2x ceiling on the
GEMM-bound fraction of eval.

Scheme (standard W8A8 dynamic quantization):
- Weights: symmetric per-OUTPUT-channel int8 — scale_w[o] =
  max_i |W[i, o]| / 127, stored once at quantization time. Per-channel
  (not per-tensor) keeps the quantization error of the wide fc1/fc2
  layers ~4x lower at zero runtime cost (the scale multiply fuses into
  the epilogue).
- Activations: symmetric per-TOKEN dynamic int8 — scale_x[b, t] =
  max_d |x[b, t, d]| / 127 computed on the fly (one VPU reduce over the
  feature dim, ~1% of the GEMM's cost). Dynamic scaling needs no
  calibration data and tracks LayerNormed activation ranges exactly.
- GEMM: `lax.dot_general(x_q, w_q, preferred_element_type=int32)` — XLA
  lowers this onto the MXU's int8 path; the s32 result is rescaled by
  scale_x * scale_w and the bias added in fp32.

Attention internals (QK^T softmax PV, the Pallas flash kernel) and
LayerNorm stay bf16/fp32: they are ~7% of FLOPs and carry the numerics
that matter. The decoder is left unquantized (its compute is negligible
at 50 queries; keeping the heads full-precision protects box regression
accuracy).

Usage (serving):
    params = fold_detector_lora(params, cfg)   # LoRA -> base kernels
    params = quantize_detector_int8(params, cfg)
    out = detector_apply(params, cfg, images, deterministic=True)

The apply functions in models/vit.py and models/layers.py dispatch on
the presence of "kernel_q" in a linear's param dict, so the same
detector_apply serves fp32/bf16/int8 param trees.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_EPS = 1e-8
_QMAX = 127.0


def quantize_linear(p: Params) -> Params:
    """Quantize one linear's kernel ([..., in, out], possibly stacked
    over a leading depth dim) to symmetric per-output-channel int8.

    Zeroed LoRA factors (post-fold) are dropped — the quantized apply
    path is a single int8 GEMM.
    """
    w = p["kernel"].astype(jnp.float32)
    w_scale = jnp.maximum(jnp.max(jnp.abs(w), axis=-2) / _QMAX, _EPS)
    w_q = jnp.clip(
        jnp.round(w / w_scale[..., None, :]), -_QMAX, _QMAX
    ).astype(jnp.int8)
    return {"kernel_q": w_q, "w_scale": w_scale, "bias": p["bias"]}


def _quantize_acts(x: jnp.ndarray):
    """Per-token symmetric dynamic quantization of activations."""
    x32 = x.astype(jnp.float32)
    x_scale = jnp.maximum(
        jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / _QMAX, _EPS
    )
    x_q = jnp.clip(jnp.round(x32 / x_scale), -_QMAX, _QMAX).astype(jnp.int8)
    return x_q, x_scale


def _int8_matmul(x, kernel_q, w_scale, bias):
    """Forward body of int8_linear (no AD rules of its own).

    Wide-K linears (fc2-shaped, K >= 2048) dispatch to the fused
    Pallas quant-GEMM kernel (ops/int8_gemm.py) on TPU: the activation
    quant pass over the wide input dominates the unfused path's
    overhead there, and the kernel hides it under the MXU (measured
    0.196 -> 0.132 ms at ViT-B b32 fc2, bit-identical). At K=768 XLA's
    own s8 dot pipeline wins — the unfused path stays."""
    k = x.shape[-1]
    if k >= 2048 and jax.default_backend() == "tpu":
        from ..ops.int8_gemm import fused_int8_linear, int8_gemm_eligible

        n = kernel_q.shape[1]
        m = 1
        for d in x.shape[:-1]:
            m *= d
        if int8_gemm_eligible(m, k, n):
            return fused_int8_linear(
                x, {"kernel_q": kernel_q, "w_scale": w_scale, "bias": bias}
            )
    x_q, x_scale = _quantize_acts(x)
    y = jax.lax.dot_general(
        x_q, kernel_q,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (x_scale * w_scale)
    return (out + bias).astype(x.dtype)


@jax.custom_vjp
def _int8_linear_ste(x, kernel_q, w_scale, bias):
    return _int8_matmul(x, kernel_q, w_scale, bias)


def _int8_linear_fwd(x, kernel_q, w_scale, bias):
    out = _int8_matmul(x, kernel_q, w_scale, bias)
    return out, (kernel_q, w_scale)


def _int8_linear_bwd(res, dy):
    # Straight-through estimator: the quantize/dequantize round-trips
    # are treated as identity, so dx flows through the DEQUANTIZED
    # weight (exact for the linear part, standard STE for the rounding).
    # Without this, jnp.round's zero gradient silently killed dx on any
    # future differentiable caller, and the Pallas path crashed under AD.
    kernel_q, w_scale = res
    w_deq = kernel_q.astype(jnp.float32) * w_scale  # [K, N]
    dy32 = dy.astype(jnp.float32)
    # The forward returns x.dtype, so dy's dtype IS x's dtype.
    dx = jax.lax.dot_general(
        dy32, w_deq, (((dy.ndim - 1,), (1,)), ((), ()))
    ).astype(dy.dtype)
    # bias grad is exact; kernel_q is integer (float0 cotangent) and
    # w_scale is a frozen quantization constant (symbolic zero).
    db = dy32.sum(axis=tuple(range(dy.ndim - 1)))
    import numpy as np

    dkq = np.zeros(kernel_q.shape, dtype=jax.dtypes.float0)
    return dx, dkq, jnp.zeros_like(w_scale), db


_int8_linear_ste.defvjp(_int8_linear_fwd, _int8_linear_bwd)


def int8_linear(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """y = dequant(quant(x) @ kernel_q) + bias, output in x.dtype.

    Differentiable w.r.t. x via a straight-through estimator (see
    _int8_linear_bwd) so callers above the frozen prefix — or future
    QAT-style uses — get correct activation gradients instead of the
    silent zeros jnp.round would produce."""
    return _int8_linear_ste(x, p["kernel_q"], p["w_scale"], p["bias"])


def int8_qkv(x: jnp.ndarray, bp: Params) -> jnp.ndarray:
    """Fused q/k/v as ONE int8 GEMM (mirrors the bf16 fused-qkv path):
    int8 kernels and per-column scales concatenate losslessly because
    both are per-output-channel."""
    w_q = jnp.concatenate(
        [bp[n]["kernel_q"] for n in ("q", "k", "v")], axis=1
    )
    w_scale = jnp.concatenate([bp[n]["w_scale"] for n in ("q", "k", "v")])
    bias = jnp.concatenate([bp[n]["bias"] for n in ("q", "k", "v")])
    return int8_linear(x, {"kernel_q": w_q, "w_scale": w_scale, "bias": bias})


def quantize_backbone_int8(params: Params) -> Params:
    """Quantize the backbone's per-block linears (stacked [depth, ...]).

    Requires LoRA already folded (fold_detector_lora zeroes the factors);
    raises if any factor is non-zero so a training tree cannot be
    quantized by mistake.
    """
    def quant_stack(stack):
        blocks = {
            k: (dict(v) if isinstance(v, dict) else v) for k, v in stack.items()
        }
        for name in ("q", "k", "v", "proj", "fc1", "fc2"):
            if name not in blocks:  # MoE blocks: experts stay fp (attention
                continue  # still quantizes; ops/moe.py einsums are bf16)
            bp = blocks[name]
            if "lora_B" in bp:
                nonzero = jnp.any(bp["lora_B"] != 0)
                if bool(nonzero):
                    raise ValueError(
                        f"block linear '{name}' has unfolded LoRA factors; "
                        "call fold_detector_lora before quantizing"
                    )
            blocks[name] = quantize_linear(bp)
        return blocks

    out = dict(params)
    if "blocks" in params:
        out["blocks"] = quant_stack(params["blocks"])
    if "moe_blocks" in params:
        out["moe_blocks"] = quant_stack(params["moe_blocks"])
    return out


def quantize_detector_int8(params: Params, cfg=None) -> Params:
    """int8-quantize the detector's backbone for serving (decoder and
    patch/pos embeddings stay full precision — see module docstring)."""
    return {
        **params,
        "backbone": quantize_backbone_int8(params["backbone"]),
    }
