"""HF PyTorch -> JAX importer parity: run transformers' Dinov2Model and our
backbone on the SAME (random) weights and compare features. This is the
no-network substitute for validating against real pretrained checkpoints
(SURVEY.md §8 hard part 4)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from dinov2_od_tpu.config import BackboneConfig
from dinov2_od_tpu.models.import_torch import load_dinov2_backbone_params
from dinov2_od_tpu.models.vit import backbone_apply, init_backbone_params


def _tiny_pair(image_size=56, hidden=64, layers=2, heads=2):
    from transformers import Dinov2Config, Dinov2Model

    tcfg = Dinov2Config(
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        intermediate_size=hidden * 4,
        image_size=image_size,
        patch_size=14,
        layerscale_value=1.0,
    )
    tmodel = Dinov2Model(tcfg).eval()

    jcfg = BackboneConfig(
        variant="small",
        image_size=image_size,
        patch_size=14,
        lora_r=1,
        drop_cls_token=False,
        hidden_dim_override=hidden,
        depth_override=layers,
        num_heads_override=heads,
        mlp_ratio_override=4.0,
        # Exact erf GELU to match torch's nn.GELU at 1e-4 tolerance.
        gelu_approximate=False,
    )
    template = init_backbone_params(jax.random.key(0), jcfg)
    params = load_dinov2_backbone_params(
        {k: v for k, v in tmodel.state_dict().items()}, jcfg, template
    )
    return tmodel, jcfg, params


def test_backbone_matches_torch_forward(rng):
    tmodel, jcfg, params = _tiny_pair()
    x = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)

    with torch.no_grad():
        ref = tmodel(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()

    ours = np.asarray(
        backbone_apply(params, jcfg, jnp.asarray(x), attn_impl="xla")
    )
    assert ours.shape == ref.shape  # [2, 1+16, 64]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_lora_zero_init_preserves_pretrained_forward(rng):
    """After import, LoRA B=0 means the forward equals the pretrained
    backbone exactly — the reference relies on the same property
    (utils.py:62-63)."""
    tmodel, jcfg, params = _tiny_pair()
    x = jnp.asarray(rng.normal(size=(1, 56, 56, 3)).astype(np.float32))
    base = np.asarray(backbone_apply(params, jcfg, x, attn_impl="xla"))

    # Perturb lora_A wildly: with B=0 the output must not move.
    params2 = jax.tree_util.tree_map(lambda p: p, params)
    params2["blocks"]["q"]["lora_A"] = params["blocks"]["q"]["lora_A"] + 100.0
    out2 = np.asarray(backbone_apply(params2, jcfg, x, attn_impl="xla"))
    np.testing.assert_array_equal(base, out2)

    # Perturb lora_B: now it must move.
    params3 = jax.tree_util.tree_map(lambda p: p, params)
    params3["blocks"]["q"]["lora_B"] = params["blocks"]["q"]["lora_B"] + 0.1
    out3 = np.asarray(backbone_apply(params3, jcfg, x, attn_impl="xla"))
    assert np.abs(out3 - base).max() > 1e-4


def test_pos_embed_interpolation_on_resolution_change(rng):
    """Import a checkpoint trained at 56px into a 112px config: position
    embeddings are resampled, forward still runs with the right shapes."""
    from transformers import Dinov2Config, Dinov2Model

    tcfg = Dinov2Config(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=128, image_size=56, patch_size=14,
    )
    tmodel = Dinov2Model(tcfg).eval()
    jcfg = BackboneConfig(
        variant="small", image_size=112, patch_size=14, lora_r=1,
        drop_cls_token=False, hidden_dim_override=32, depth_override=1,
        num_heads_override=2, mlp_ratio_override=4.0,
    )
    template = init_backbone_params(jax.random.key(0), jcfg)
    params = load_dinov2_backbone_params(
        {k: v for k, v in tmodel.state_dict().items()}, jcfg, template
    )
    assert params["pos_embed"].shape == (1, 1 + 64, 32)
    out = backbone_apply(
        params, jcfg, jnp.zeros((1, 112, 112, 3)), attn_impl="xla"
    )
    assert out.shape == (1, 65, 32)


def test_swiglu_backbone_matches_torch_forward(rng):
    """ViT-giant style SwiGLU FFN path vs transformers' Dinov2SwiGLUFFN."""
    from transformers import Dinov2Config, Dinov2Model

    hidden, layers, heads = 64, 2, 2
    tcfg = Dinov2Config(
        hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, mlp_ratio=4, use_swiglu_ffn=True,
        image_size=56, patch_size=14, layerscale_value=1.0,
    )
    tmodel = Dinov2Model(tcfg).eval()

    # HF SwiGLU hidden = round8(hidden * mlp_ratio * 2/3) = 176 for 64*4;
    # expressed here as mlp_ratio_override = 176/64.
    jcfg = BackboneConfig(
        variant="giant", image_size=56, patch_size=14, lora_r=1,
        drop_cls_token=False, hidden_dim_override=hidden,
        depth_override=layers, num_heads_override=heads,
        mlp_ratio_override=176 / 64, ffn_type_override="swiglu",
    )
    assert jcfg.mlp_dim == 176
    template = init_backbone_params(jax.random.key(0), jcfg)
    params = load_dinov2_backbone_params(
        {k: v for k, v in tmodel.state_dict().items()}, jcfg, template
    )

    x = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()
    ours = np.asarray(
        backbone_apply(params, jcfg, jnp.asarray(x), attn_impl="xla")
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
