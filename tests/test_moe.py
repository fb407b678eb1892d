"""MoE FFN + expert parallelism (ops/moe.py, ffn_type='moe').

Beyond-reference capability (the reference has dense FFNs only):
- routing correctness against a dense per-token oracle (no drops),
- capacity semantics (over-capacity tokens produce zero FFN output),
- load-balance aux loss values,
- trainability policy (router/experts follow the LoRA placement),
- end-to-end train step with the MoE backbone,
- EP: expert-sharded forward equals the single-device forward on the
  virtual CPU mesh.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dinov2_od_tpu.config import (
    BackboneConfig,
    DecoderConfig,
    DetectorConfig,
    OptimConfig,
    TrainConfig,
)
from dinov2_od_tpu.data.synthetic import NUM_SYNTHETIC_CLASSES, make_batch
from dinov2_od_tpu.models import init_detector_params
from dinov2_od_tpu.models.detector import (
    detector_apply,
    lora_block_multiplier,
    trainable_mask,
)
from dinov2_od_tpu.models.vit import backbone_apply, init_backbone_params
from dinov2_od_tpu.ops.moe import moe_capacity, moe_ffn, moe_routing
from dinov2_od_tpu.parallel import batch_sharding, create_mesh, shard_params
from dinov2_od_tpu.train import create_train_state, make_optimizer, make_train_step


def _moe_params(rng, d, m, e):
    keys = jax.random.split(rng, 5)
    scale = 0.3
    return {
        "router_kernel": scale * jax.random.normal(keys[0], (d, e)),
        "fc1_kernel": scale * jax.random.normal(keys[1], (e, d, m)),
        "fc1_bias": scale * jax.random.normal(keys[2], (e, m)),
        "fc2_kernel": scale * jax.random.normal(keys[3], (e, m, d)),
        "fc2_bias": scale * jax.random.normal(keys[4], (e, d)),
    }


def _dense_oracle(x, mp, top_k):
    """Per-token dense computation of the same top-k mixture (no capacity
    limits): for each token, run its selected experts' FFNs and combine
    with renormalized gate probabilities."""
    b, n, d = x.shape
    e = mp["router_kernel"].shape[-1]
    probs = jax.nn.softmax(x @ mp["router_kernel"], axis=-1)
    out = np.zeros_like(np.asarray(x))
    for bi in range(b):
        for ni in range(n):
            p = np.asarray(probs[bi, ni])
            idx = np.argsort(-p)[:top_k]
            gates = p[idx] / p[idx].sum()
            tok = x[bi, ni]
            for g, ei in zip(gates, idx):
                hidden = jax.nn.gelu(
                    tok @ mp["fc1_kernel"][ei] + mp["fc1_bias"][ei],
                    approximate=True,
                )
                y = hidden @ mp["fc2_kernel"][ei] + mp["fc2_bias"][ei]
                out[bi, ni] += g * np.asarray(y)
    return out


class TestRouting:
    def test_matches_dense_oracle_when_capacity_ample(self):
        d, m, e, k = 8, 16, 4, 2
        rng = jax.random.key(0)
        mp = _moe_params(rng, d, m, e)
        x = jax.random.normal(jax.random.key(1), (2, 12, d))
        # capacity_factor large enough that no token is ever dropped
        out, aux = moe_ffn(
            x, mp, top_k=k, capacity_factor=float(e),
            activation=lambda h: jax.nn.gelu(h, approximate=True),
        )
        expected = _dense_oracle(x, mp, k)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)
        assert np.isfinite(float(aux))

    def test_top1_matches_oracle(self):
        d, m, e = 8, 16, 4
        mp = _moe_params(jax.random.key(2), d, m, e)
        x = jax.random.normal(jax.random.key(3), (1, 10, d))
        out, _ = moe_ffn(
            x, mp, top_k=1, capacity_factor=float(e),
            activation=lambda h: jax.nn.gelu(h, approximate=True),
        )
        expected = _dense_oracle(x, mp, 1)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    def test_capacity_drops_zero_output(self):
        # Route EVERY token to expert 0 (router forced), capacity 2:
        # only the first 2 tokens per row get FFN output.
        d, m, e = 4, 8, 2
        mp = _moe_params(jax.random.key(4), d, m, e)
        mp["router_kernel"] = jnp.zeros((d, e)).at[:, 0].set(100.0)
        n = 6
        x = jnp.ones((1, n, d)) + jnp.arange(n)[None, :, None] * 0.1
        cap = moe_capacity(n, e, 1, 2 * e / n)  # == 2
        assert cap == 2
        out, _ = moe_ffn(
            x, mp, top_k=1, capacity_factor=2 * e / n,
            activation=lambda h: jax.nn.gelu(h, approximate=True),
        )
        out = np.asarray(out)
        # tokens 0,1 claimed the two slots; 2.. are dropped -> zeros
        assert np.abs(out[0, :2]).sum() > 0
        np.testing.assert_allclose(out[0, 2:], 0.0, atol=1e-7)

    def test_aux_loss_balanced_is_one(self):
        # Uniform router -> f_e = P_e = 1/E -> aux = E * E * (1/E^2) = 1.
        b, n, e = 2, 16, 4
        logits = jnp.zeros((b, n, e))
        _, aux = moe_routing(logits, top_k=1, capacity=n)
        assert abs(float(aux) - 1.0) < 1e-6

    def test_aux_loss_collapsed_is_expert_count(self):
        # Everything on one expert -> f_0 = P_0 = 1 -> aux = E.
        b, n, e = 2, 16, 4
        logits = jnp.full((b, n, e), -50.0).at[..., 0].set(50.0)
        _, aux = moe_routing(logits, top_k=1, capacity=n)
        assert abs(float(aux) - e) < 1e-4

    def test_combine_weights_sum_to_one_when_kept(self):
        d, e, k, n = 8, 4, 2, 12
        mp = _moe_params(jax.random.key(5), d, 16, e)
        x = jax.random.normal(jax.random.key(6), (2, n, d))
        logits = x @ mp["router_kernel"]
        combine, _ = moe_routing(logits, top_k=k, capacity=n)
        # With ample capacity every token keeps all k assignments; the
        # renormalized gates sum to 1 per token.
        sums = np.asarray(jnp.sum(combine, axis=(2, 3)))
        np.testing.assert_allclose(sums, 1.0, atol=1e-6)


def _moe_backbone_cfg(**kw):
    base = dict(
        variant="small", image_size=56, patch_size=14, lora_r=1,
        target_dim=32, hidden_dim_override=48, depth_override=3,
        num_heads_override=4, mlp_ratio_override=2.0,
        ffn_type_override="moe", moe_num_experts=4, moe_top_k=2,
        lora_last_n_blocks=2,
    )
    base.update(kw)
    return BackboneConfig(**base)


class TestBackboneMoE:
    def test_forward_shape_and_aux(self):
        cfg = _moe_backbone_cfg()
        params = init_backbone_params(jax.random.key(0), cfg)
        x = jax.random.normal(jax.random.key(1), (2, 56, 56, 3))
        feats, aux = backbone_apply(params, cfg, x)
        assert feats.shape == (2, 16, 32)
        assert np.isfinite(float(aux))
        # depth-mean of per-block aux values, each >= 1 in expectation
        assert float(aux) > 0.1

    def test_moe_leaves_trainable_policy(self):
        cfg = _moe_backbone_cfg()
        det = DetectorConfig(
            backbone=cfg,
            decoder=DecoderConfig(
                hidden_dim=32, num_queries=8, num_layers=1, num_heads=4,
                dim_feedforward=64, num_classes=NUM_SYNTHETIC_CLASSES,
                dropout=0.0,
            ),
        )
        params = init_detector_params(jax.random.key(0), det)
        # Split layout: depth 3, last 2 adapted -> dense prefix stack of
        # 1 block + MoE suffix stack of 2 blocks.
        assert params["backbone"]["blocks"]["fc1"]["kernel"].shape[0] == 1
        moe_fc1 = params["backbone"]["moe_blocks"]["moe"]["fc1_kernel"]
        assert moe_fc1.shape[0] == 2
        mask = trainable_mask(params, det)
        moe_mask = mask["backbone"]["moe_blocks"]["moe"]
        assert all(bool(v) for v in jax.tree_util.tree_leaves(moe_mask))
        # The suffix stack holds only adapted blocks: multiplier 1 on
        # every moe leaf; the dense prefix's LoRA multiplier is 0.
        mult = lora_block_multiplier(params, det)
        m = np.asarray(
            mult["backbone"]["moe_blocks"]["moe"]["fc1_kernel"]
        ).reshape(-1)
        np.testing.assert_allclose(m, [1.0])
        pm = np.asarray(
            mult["backbone"]["blocks"]["q"]["lora_A"]
        ).reshape(-1)
        np.testing.assert_allclose(pm, [0.0])

    def test_train_step_updates_experts(self):
        cfg = _moe_backbone_cfg()
        det = DetectorConfig(
            backbone=cfg,
            decoder=DecoderConfig(
                hidden_dim=32, num_queries=8, num_layers=1, num_heads=4,
                dim_feedforward=64, num_classes=NUM_SYNTHETIC_CLASSES,
                dropout=0.0,
            ),
        )
        tc = TrainConfig(detector=det, optim=OptimConfig(learning_rate=1e-3))
        params = init_detector_params(jax.random.key(0), det)
        tx = make_optimizer(tc.optim, det, params)
        # Snapshot before the step: the train step donates the state.
        before = np.asarray(
            params["backbone"]["moe_blocks"]["moe"]["fc1_kernel"]
        )
        r_before = np.asarray(
            params["backbone"]["moe_blocks"]["moe"]["router_kernel"]
        )
        dense_before = np.asarray(
            params["backbone"]["blocks"]["fc1"]["kernel"]
        )
        state = create_train_state(params, tc.optim, det)
        batch = make_batch(np.random.default_rng(0), 4, image_size=56)
        step = make_train_step(tc, tx)
        new_state, metrics = step(state, batch, jax.random.key(0))
        assert np.isfinite(float(metrics["loss"]))
        assert "loss_moe_aux" in metrics
        after = np.asarray(
            new_state.params["backbone"]["moe_blocks"]["moe"]["fc1_kernel"]
        )
        # Both adapted MoE blocks move; the frozen dense prefix does not.
        assert not np.array_equal(before[0], after[0])
        assert not np.array_equal(before[1], after[1])
        dense_after = np.asarray(
            new_state.params["backbone"]["blocks"]["fc1"]["kernel"]
        )
        assert np.array_equal(dense_before, dense_after)
        # Router must receive gradient through the gates too.
        r_after = np.asarray(
            new_state.params["backbone"]["moe_blocks"]["moe"]["router_kernel"]
        )
        assert not np.array_equal(r_before[1], r_after[1])


class TestUpcycledLayout:
    def test_prefix_int8_composes(self):
        # The dense frozen prefix quantizes exactly as in the dense path
        # (the MoE suffix stays fp): forward runs and is close to fp.
        cfg = _moe_backbone_cfg()
        params = init_backbone_params(jax.random.key(0), cfg)
        x = jax.random.normal(jax.random.key(1), (2, 56, 56, 3))
        ref, ref_aux = backbone_apply(params, cfg, x)
        cfg_q = dataclasses.replace(cfg, prefix_int8=True)
        out, aux = backbone_apply(params, cfg_q, x)
        assert out.shape == ref.shape
        err = float(jnp.max(jnp.abs(out - ref)))
        scale = float(jnp.max(jnp.abs(ref)))
        assert err < 0.1 * scale + 0.05, (err, scale)

    def test_import_upcycles_pretrained_ffn(self):
        # Sparse upcycling: every expert of an imported MoE block starts
        # as the block's pretrained dense FFN -> with ample capacity the
        # MoE output equals the dense FFN output (gates sum to 1 over
        # identical experts), so the imported model reproduces the dense
        # pretrained forward exactly at init.
        from dinov2_od_tpu.models.import_torch import (
            load_dinov2_backbone_params,
        )

        torch = pytest.importorskip("torch")
        cfg_dense = _moe_backbone_cfg(ffn_type_override="mlp")
        cfg_moe = _moe_backbone_cfg(moe_capacity_factor=4.0)
        d, m, depth = cfg_dense.hidden_dim, cfg_dense.mlp_dim, cfg_dense.depth

        gen = torch.Generator().manual_seed(0)
        sd = {}
        sd["embeddings.patch_embeddings.projection.weight"] = torch.randn(
            (d, 3, 14, 14), generator=gen
        ) * 0.02
        sd["embeddings.patch_embeddings.projection.bias"] = torch.zeros(d)
        sd["embeddings.cls_token"] = torch.randn((1, 1, d), generator=gen) * 0.02
        n_src = cfg_dense.grid_size**2
        sd["embeddings.position_embeddings"] = (
            torch.randn((1, 1 + n_src, d), generator=gen) * 0.02
        )
        for i in range(depth):
            pre = f"encoder.layer.{i}."
            for lin, (i_dim, o_dim) in {
                "attention.attention.query": (d, d),
                "attention.attention.key": (d, d),
                "attention.attention.value": (d, d),
                "attention.output.dense": (d, d),
                "mlp.fc1": (d, m),
                "mlp.fc2": (m, d),
            }.items():
                sd[pre + lin + ".weight"] = (
                    torch.randn((o_dim, i_dim), generator=gen) * 0.05
                )
                sd[pre + lin + ".bias"] = torch.zeros(o_dim)
            for ln in ("norm1", "norm2"):
                sd[pre + ln + ".weight"] = torch.ones(d)
                sd[pre + ln + ".bias"] = torch.zeros(d)
            sd[pre + "layer_scale1.lambda1"] = torch.ones(d)
            sd[pre + "layer_scale2.lambda1"] = torch.ones(d)
        sd["layernorm.weight"] = torch.ones(d)
        sd["layernorm.bias"] = torch.zeros(d)

        tmpl_dense = init_backbone_params(jax.random.key(0), cfg_dense)
        tmpl_moe = init_backbone_params(jax.random.key(0), cfg_moe)
        p_dense = load_dinov2_backbone_params(sd, cfg_dense, tmpl_dense)
        p_moe = load_dinov2_backbone_params(sd, cfg_moe, tmpl_moe)

        e = cfg_moe.moe_num_experts
        fc1 = np.asarray(p_moe["moe_blocks"]["moe"]["fc1_kernel"])
        for ei in range(e):  # all experts start identical
            np.testing.assert_array_equal(fc1[:, ei], fc1[:, 0])

        x = jax.random.normal(jax.random.key(1), (2, 56, 56, 3))
        ref = backbone_apply(p_dense, cfg_dense, x)
        out, _ = backbone_apply(p_moe, cfg_moe, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 devices")
class TestExpertParallel:
    def test_ep_sharded_forward_matches_single_device(self):
        cfg = _moe_backbone_cfg()
        det = DetectorConfig(
            backbone=cfg,
            decoder=DecoderConfig(
                hidden_dim=32, num_queries=8, num_layers=1, num_heads=4,
                dim_feedforward=64, num_classes=NUM_SYNTHETIC_CLASSES,
                dropout=0.0,
            ),
        )
        tc = TrainConfig(detector=det)
        params = init_detector_params(jax.random.key(0), det)
        images = jax.random.normal(jax.random.key(1), (4, 56, 56, 3))

        ref = detector_apply(params, det, images, deterministic=True)

        mesh = create_mesh(model_parallel_size=2, devices=jax.devices()[:4])
        sharded = shard_params(params, mesh)
        imgs = jax.device_put(images, batch_sharding(mesh))

        @jax.jit
        def fwd(p, x):
            return detector_apply(
                p, det, x, deterministic=True, mesh=mesh,
                tp_axis="model", batch_axis="data",
            )

        out = fwd(sharded, imgs)
        np.testing.assert_allclose(
            np.asarray(out["pred_logits"]),
            np.asarray(ref["pred_logits"]),
            atol=2e-4,
        )
        np.testing.assert_allclose(
            float(out["moe_aux"]), float(ref["moe_aux"]), atol=1e-5
        )

    def test_ep_expert_weights_actually_sharded(self):
        cfg = _moe_backbone_cfg()
        det = DetectorConfig(
            backbone=cfg,
            decoder=DecoderConfig(
                hidden_dim=32, num_queries=8, num_layers=1, num_heads=4,
                dim_feedforward=64, num_classes=NUM_SYNTHETIC_CLASSES,
                dropout=0.0,
            ),
        )
        params = init_detector_params(jax.random.key(0), det)
        mesh = create_mesh(model_parallel_size=2, devices=jax.devices()[:4])
        sharded = shard_params(params, mesh)
        fc1 = sharded["backbone"]["moe_blocks"]["moe"]["fc1_kernel"]
        spec = fc1.sharding.spec
        # [n_moe, E, d, m]: E sharded over 'model'
        assert tuple(spec) == (None, "model", None, None)
        router = sharded["backbone"]["moe_blocks"]["moe"]["router_kernel"]
        assert all(s is None for s in tuple(router.sharding.spec))

    def test_ep_train_step_on_mesh(self):
        cfg = _moe_backbone_cfg()
        det = DetectorConfig(
            backbone=cfg,
            decoder=DecoderConfig(
                hidden_dim=32, num_queries=8, num_layers=1, num_heads=4,
                dim_feedforward=64, num_classes=NUM_SYNTHETIC_CLASSES,
                dropout=0.0,
            ),
        )
        tc = TrainConfig(detector=det, optim=OptimConfig(learning_rate=1e-3))
        mesh = create_mesh(model_parallel_size=2, devices=jax.devices()[:4])
        params = shard_params(init_detector_params(jax.random.key(0), det), mesh)
        tx = make_optimizer(tc.optim, det, params)
        state = create_train_state(params, tc.optim, det)
        batch = make_batch(np.random.default_rng(0), 4, image_size=56)
        batch = {
            k: jax.device_put(jnp.asarray(v), batch_sharding(mesh))
            for k, v in batch.items()
        }
        step = make_train_step(tc, tx, mesh=mesh)
        new_state, metrics = step(state, batch, jax.random.key(0))
        assert np.isfinite(float(metrics["loss"]))
        assert "loss_moe_aux" in metrics
