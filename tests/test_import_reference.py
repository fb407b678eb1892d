"""Full-detector migration parity: import the ACTUAL reference
DINOv2ObjectDetector's state dict and match its forward outputs, for both
attention paths. This is the trained-checkpoint migration guarantee for
users switching from the PyTorch reference."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def reference_detector_cls():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    if "pycocotools" not in sys.modules:
        pm = types.ModuleType("pycocotools")
        pm.coco = types.ModuleType("pycocotools.coco")
        pm.coco.COCO = object
        pm.cocoeval = types.ModuleType("pycocotools.cocoeval")
        pm.cocoeval.COCOeval = object
        sys.modules["pycocotools"] = pm
        sys.modules["pycocotools.coco"] = pm.coco
        sys.modules["pycocotools.cocoeval"] = pm.cocoeval

    import transformers
    from transformers import Dinov2Config, Dinov2Model

    def fake_from_pretrained(*a, **k):
        # hidden_size must be 384: the reference's DINOv2Backbone derives
        # dims from the model NAME ('small' -> 384) and sizes its projection
        # accordingly (dinov2_backbone.py:17-35).
        cfg = Dinov2Config(
            hidden_size=384, num_hidden_layers=3, num_attention_heads=6,
            intermediate_size=1536, image_size=56, patch_size=14,
            layerscale_value=1.0,
        )
        torch.manual_seed(11)
        return Dinov2Model(cfg)

    transformers.Dinov2Model.from_pretrained = classmethod(
        lambda cls, *a, **k: fake_from_pretrained()
    )
    from dino_detector.models.detector import DINOv2ObjectDetector

    return DINOv2ObjectDetector


def _our_config(use_deformable):
    from dinov2_od_tpu.config import BackboneConfig, DecoderConfig, DetectorConfig

    return DetectorConfig(
        backbone=BackboneConfig(
            variant="small", image_size=56, patch_size=14, lora_r=2,
            lora_alpha=1.0, target_dim=32, drop_cls_token=False,
            depth_override=3, mlp_ratio_override=4.0,
            # Exact erf GELU: this parity test compares against torch's
            # nn.GELU at 5e-4 tolerance.
            gelu_approximate=False,
        ),
        decoder=DecoderConfig(
            hidden_dim=32, num_queries=6, num_layers=2, num_heads=4,
            dim_feedforward=64, num_classes=9, use_deformable=use_deformable,
            n_points=2, dropout=0.0,
            tie_layer_weights=use_deformable,  # reference ties deformable layers
        ),
    )


@pytest.mark.parametrize("use_deformable", [False, True])
def test_full_detector_forward_parity(reference_detector_cls, rng, use_deformable):
    import jax
    import jax.numpy as jnp

    from dinov2_od_tpu.models import detector_apply, init_detector_params
    from dinov2_od_tpu.models.import_reference import load_reference_detector_params

    torch.manual_seed(5)
    ref_model = reference_detector_cls(
        num_classes=9, dino_model_name="facebook/dinov2-small",
        lora_r=2, lora_alpha=1.0, hidden_dim=32, num_queries=6, nheads=4,
        num_decoder_layers=2, dim_feedforward=64, dropout=0.0,
        n_points=2, use_deformable=use_deformable,
    ).eval()
    # Give LoRA a nonzero effect so the adapters are actually validated.
    with torch.no_grad():
        for name, p in ref_model.named_parameters():
            if "lora_B" in name:
                p.add_(0.02 * torch.randn_like(p))

    cfg = _our_config(use_deformable)
    template = init_detector_params(jax.random.key(0), cfg)
    params = load_reference_detector_params(
        {k: v for k, v in ref_model.state_dict().items()}, cfg, template
    )

    x = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = detector_apply(params, cfg, jnp.asarray(x), deterministic=True)

    np.testing.assert_allclose(
        np.asarray(ours["pred_logits"]),
        ref_out["pred_logits"].numpy(),
        rtol=5e-4, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["pred_boxes"]),
        ref_out["pred_boxes"].numpy(),
        rtol=5e-4, atol=5e-4,
    )
