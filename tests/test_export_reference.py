"""Export -> reference format -> re-import roundtrip, and direct load into
the actual reference torch model with forward parity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from dinov2_od_tpu.models import detector_apply, init_detector_params
from dinov2_od_tpu.models.export_reference import export_reference_state_dict
from dinov2_od_tpu.models.import_reference import load_reference_detector_params

from test_import_reference import _our_config, reference_detector_cls  # noqa: F401


@pytest.mark.parametrize("use_deformable", [True, False])
def test_roundtrip_export_import(use_deformable):
    cfg = _our_config(use_deformable)
    params = init_detector_params(jax.random.key(2), cfg)
    # Nonzero LoRA so the adapter path is exercised.
    params["backbone"]["blocks"]["q"]["lora_B"] = (
        params["backbone"]["blocks"]["q"]["lora_B"] + 0.04
    )
    sd = export_reference_state_dict(params, cfg)
    back = load_reference_detector_params(sd, cfg, params)

    flat_a, _ = jax.tree_util.tree_flatten_with_path(params)
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    flat_b = {jax.tree_util.keystr(k): v for k, v in flat_b.items()}
    for path, leaf in flat_a:
        key = jax.tree_util.keystr(path)
        if "lora" in key:
            # Import zeroes non-adapted blocks' factors (they are inert
            # in the reference format); compare adapted blocks only.
            depth = cfg.backbone.depth
            n = cfg.backbone.lora_last_n_blocks
            np.testing.assert_allclose(
                np.asarray(leaf)[depth - n :],
                np.asarray(flat_b[key])[depth - n :],
                rtol=1e-6, atol=1e-7,
            )
        else:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_b[key]), rtol=1e-6, atol=1e-7
            ), key


def test_export_loads_into_actual_reference_model(reference_detector_cls, rng):
    """The exported dict load_state_dicts into the real reference model and
    produces the same forward outputs as our detector."""
    cfg = _our_config(use_deformable=True)
    params = init_detector_params(jax.random.key(3), cfg)
    sd = export_reference_state_dict(params, cfg)

    torch.manual_seed(0)
    ref_model = reference_detector_cls(
        num_classes=9, dino_model_name="facebook/dinov2-small",
        lora_r=2, lora_alpha=1.0, hidden_dim=32, num_queries=6, nheads=4,
        num_decoder_layers=2, dim_feedforward=64, dropout=0.0,
        n_points=2, use_deformable=True,
    ).eval()
    missing, unexpected = ref_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    # Everything we export must be consumed; the reference may have extra
    # buffers we don't produce (none known besides what we export).
    assert not unexpected, unexpected
    assert not [m for m in missing if "mask_token" not in m], missing

    x = rng.normal(size=(1, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = detector_apply(params, cfg, jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(
        np.asarray(ours["pred_logits"]), ref_out["pred_logits"].numpy(),
        rtol=5e-4, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["pred_boxes"]), ref_out["pred_boxes"].numpy(),
        rtol=5e-4, atol=5e-4,
    )
