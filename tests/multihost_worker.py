"""Worker process for the multi-host integration test.

Each worker joins a jax.distributed CPU job (Gloo collectives over
localhost), then drives the REAL product path — run_training (per-host
loader slices, make_array_from_process_local_data batch assembly, SPMD
train steps, multihost validate, collective Orbax save) followed by
evaluate_dataset — and writes a JSON digest (param sums, detection ids)
for the parent test to compare across processes and against a
single-process run.

Usage: multihost_worker.py <port> <process_id> <process_count>
                           <images_dir> <ann_file> <out_dir>
(reference equivalent being replaced: torch.distributed launch +
DistributedSampler, dino_detector/train.py:491-512, :919)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    port, pid, pc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    images_dir, ann_file, out_dir = sys.argv[4], sys.argv[5], sys.argv[6]

    from dinov2_od_tpu.parallel.multihost import initialize_multihost

    if pc > 1:
        initialize_multihost(f"127.0.0.1:{port}", pc, pid)
    assert jax.process_count() == pc and jax.process_index() == pid

    import numpy as np

    from dinov2_od_tpu.config import (
        BackboneConfig,
        DataConfig,
        DecoderConfig,
        DetectorConfig,
        OptimConfig,
        TrainConfig,
    )
    from dinov2_od_tpu.data.coco import CocoDetectionDataset
    from dinov2_od_tpu.models import init_detector_params
    from dinov2_od_tpu.train.loop import evaluate_dataset, run_training
    from dinov2_od_tpu.train.step import make_eval_topk_step

    ds = CocoDetectionDataset(images_dir, ann_file, image_size=56, max_boxes=6)
    det = DetectorConfig(
        backbone=BackboneConfig(
            variant="small", image_size=56, patch_size=14, lora_r=2,
            target_dim=48, hidden_dim_override=96, depth_override=2,
            num_heads_override=4, mlp_ratio_override=2.0,
        ),
        decoder=DecoderConfig(
            hidden_dim=48, num_queries=8, num_layers=2, num_heads=4,
            dim_feedforward=96, num_classes=ds.num_classes,
            use_deformable=True, dropout=0.0,
        ),
    )
    cfg = TrainConfig(
        detector=det,
        data=DataConfig(batch_size=8, image_size=56, max_boxes=6),
        optim=OptimConfig(learning_rate=1e-3),
        seed=3,
    )

    params = init_detector_params(jax.random.key(0), det)
    state = run_training(
        cfg, params, ds, ds, out_dir,
        num_epochs=1, val_frequency=1, checkpoint_every=1,
    )

    # Standalone eval must run over the GLOBAL mesh: in multi-controller
    # JAX every process executes the same program, so per-host batch
    # slices must be assembled into global arrays (batch_sharding_),
    # never device_put locally.
    from dinov2_od_tpu.parallel import auto_mesh, batch_sharding

    mesh = auto_mesh(cfg.data.batch_size)
    eval_step = make_eval_topk_step(cfg, mesh=mesh)
    results = evaluate_dataset(
        eval_step, state.params, ds, cfg.data.batch_size, ds.label_to_cat_id,
        batch_sharding_=batch_sharding(mesh),
    )

    # Second run, same config/seed, through the sharded device-resident
    # cache (multi-host layout: each process uploads only its addressable
    # row shards; batches routed by psum_scatter). The cache path
    # consumes the DataLoader's exact batch order, so its trajectory must
    # reproduce the loader run's.
    cache_state = run_training(
        cfg, init_detector_params(jax.random.key(0), det), ds, ds,
        os.path.join(out_dir, "cache_run"),
        num_epochs=1, val_frequency=1, checkpoint_every=1,
        device_cache=True, steps_per_dispatch=2,
    )

    def _sums(params):
        return {
            jax.tree_util.keystr(path): float(np.sum(np.asarray(leaf)))
            for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
        }

    digest = {
        "pid": pid,
        "param_sums": _sums(state.params),
        "cache_param_sums": _sums(cache_state.params),
        "n_results": len(results),
        "result_ids": sorted({r["image_id"] for r in results}),
        "score_sum": float(sum(r["score"] for r in results)),
    }
    with open(os.path.join(out_dir, f"digest_{pc}p_{pid}.json"), "w") as f:
        json.dump(digest, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
