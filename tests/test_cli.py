"""End-to-end CLI tests on a synthetic COCO dataset: the `--debug
--lightweight` overfit harness, resume, and only_evaluate — the test-side
equivalent of the reference's CLI verification strategy (SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest

from dinov2_od_tpu.data.synthetic import write_coco_dataset
from dinov2_od_tpu.train.cli import build_arg_parser, main, str2bool


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    out = tmp_path_factory.mktemp("synthcoco")
    images_dir, ann_file = write_coco_dataset(
        str(out), num_images=12, image_size=56, seed=0
    )
    return images_dir, ann_file


def test_str2bool_fixes_reference_quirk():
    # Reference: --use_deformable False parsed as True (train.py:1421).
    assert str2bool("False") is False
    assert str2bool("true") is True
    assert str2bool("0") is False


def test_arg_parser_covers_reference_flags():
    p = build_arg_parser()
    flags = {a.dest for a in p._actions}
    for ref_flag in (
        "train_images", "train_annotations", "val_images", "val_annotations",
        "testdev_images", "data_dir", "download_train_data",
        "download_val_data", "download_test_data", "output_dir", "checkpoint",
        "val_frequency", "only_evaluate", "distributed", "world_size",
        "dist_url", "debug", "debug_samples", "batch_size", "debug_lr",
        "use_coco_mini", "coco_mini_size", "coco_mini_seed",
        "coco_mini_indices_file", "test_mini", "test_mini_size",
        "use_deformable", "n_points", "dino_model", "lightweight",
        "skip_checkpoint_load", "set_cost_class", "set_cost_bbox",
        "set_cost_giou", "focal_alpha", "focal_gamma", "device",
        "num_classes", "memory_monitor", "log_dir", "log_frequency",
        "experiment_name", "log_images", "log_images_frequency",
    ):
        assert ref_flag in flags, f"missing reference flag {ref_flag}"


def test_gradient_accumulation_flag_parses():
    """--gradient_accumulation_steps reaches OptimConfig (the recommended
    path to effective batches past the per-chip sweet spot — BENCH.md
    'Batch-64')."""
    p = build_arg_parser()
    args = p.parse_args(["--gradient_accumulation_steps", "4"])
    assert args.gradient_accumulation_steps == 4
    # Default must stay 1 (every-step updates).
    assert p.parse_args([]).gradient_accumulation_steps == 1


@pytest.mark.slow
def test_debug_overfit_via_cli(synth, tmp_path):
    """`--debug --lightweight` at 56px: loss must drop over 3 epochs, and
    checkpoints/logs/final model must appear."""
    images_dir, ann_file = synth
    out = str(tmp_path / "run1")
    rc = main([
        "--train_images", images_dir,
        "--train_annotations", ann_file,
        "--debug", "--debug_samples", "8",
        "--lightweight",
        "--image_size", "56",
        "--batch_size", "4",
        "--num_classes", "6",
        "--num_epochs", "3",
        "--learning_rate", "3e-4",
        "--output_dir", out,
        "--val_frequency", "100",
        "--log_frequency", "1",
    ])
    assert rc == 0
    assert os.path.isdir(os.path.join(out, "final_model"))
    assert os.path.isdir(os.path.join(out, "checkpoint_epoch_2"))
    # Loss decreased across epochs.
    hist_file = os.path.join(out, "checkpoint_epoch_2", "metrics_history.json")
    with open(hist_file) as f:
        hist = json.load(f)
    assert len(hist["train_loss"]) == 3
    assert hist["train_loss"][-1] < hist["train_loss"][0]


@pytest.mark.slow
def test_resume_from_checkpoint(synth, tmp_path):
    images_dir, ann_file = synth
    out = str(tmp_path / "run2")
    args = [
        "--train_images", images_dir, "--train_annotations", ann_file,
        "--debug", "--debug_samples", "8", "--lightweight",
        "--image_size", "56", "--batch_size", "4", "--num_classes", "6",
        "--output_dir", out, "--val_frequency", "100",
    ]
    assert main(args + ["--num_epochs", "1"]) == 0
    ckpt = os.path.join(out, "checkpoint_epoch_0")
    assert os.path.isdir(ckpt)
    # Resume: starts at epoch 1, trains one more.
    assert main(args + ["--num_epochs", "2", "--checkpoint", ckpt]) == 0
    hist_file = os.path.join(out, "checkpoint_epoch_1", "metrics_history.json")
    with open(hist_file) as f:
        hist = json.load(f)
    assert hist["epochs"] == [0, 1]


def test_only_evaluate_val(synth, tmp_path):
    images_dir, ann_file = synth
    out = str(tmp_path / "run3")
    rc = main([
        "--only_evaluate",
        "--val_images", images_dir,
        "--val_annotations", ann_file,
        "--lightweight", "--image_size", "56", "--batch_size", "4",
        "--num_classes", "6",
        "--output_dir", out,
    ])
    assert rc == 0
    metrics_files = [f for f in os.listdir(out) if f.startswith("metrics_epoch_")]
    assert metrics_files
    with open(os.path.join(out, metrics_files[0])) as f:
        metrics = json.load(f)
    assert set(metrics) == {
        "AP", "AP50", "AP75", "APs", "APm", "APl",
        "AR1", "AR10", "AR100", "ARs", "ARm", "ARl",
    }


def test_only_evaluate_testdev_with_test_mini(synth, tmp_path):
    images_dir, _ = synth
    out = str(tmp_path / "run4")
    rc = main([
        "--only_evaluate",
        "--testdev_images", images_dir,
        "--test_mini", "--test_mini_size", "5",
        "--lightweight", "--image_size", "56", "--batch_size", "4",
        "--num_classes", "6",
        "--output_dir", out,
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "testdev_predictions.json"))
    assert os.path.exists(os.path.join(out, "test_mini_indices.json"))


@pytest.mark.slow
def test_coco_mini_indices_saved_and_reloaded(synth, tmp_path):
    """--use_coco_mini trains on a seeded subset, persists the indices
    JSON, and --coco_mini_indices_file reproduces the exact subset
    (reference train.py:86-216)."""
    images_dir, ann_file = synth
    out = str(tmp_path / "mini1")
    args = [
        "--train_images", images_dir, "--train_annotations", ann_file,
        "--lightweight", "--image_size", "56", "--batch_size", "4",
        "--num_classes", "6", "--num_epochs", "1", "--val_frequency", "100",
        "--use_coco_mini", "--coco_mini_size", "8", "--coco_mini_seed", "7",
    ]
    assert main(args + ["--output_dir", out]) == 0
    idx_file = os.path.join(out, "coco_mini_indices_8_7.json")
    assert os.path.exists(idx_file)
    with open(idx_file) as f:
        saved = json.load(f)
    assert len(saved["indices"]) == 8

    out2 = str(tmp_path / "mini2")
    assert main(args + [
        "--output_dir", out2, "--coco_mini_indices_file", idx_file,
    ]) == 0


@pytest.mark.slow
def test_bfloat16_backbone_train_and_resume(synth, tmp_path):
    """--backbone_dtype bfloat16: frozen weights stored bf16
    (cast_frozen_weights in the loop), training runs, checkpoints written
    in bf16 restore cleanly into a resumed run (merge_compatible casts to
    the template dtype)."""
    images_dir, ann_file = synth
    out = str(tmp_path / "run_bf16")
    args = [
        "--train_images", images_dir, "--train_annotations", ann_file,
        "--debug", "--debug_samples", "8", "--lightweight",
        "--image_size", "56", "--batch_size", "4", "--num_classes", "6",
        "--output_dir", out, "--val_frequency", "100",
        "--backbone_dtype", "bfloat16",
    ]
    assert main(args + ["--num_epochs", "1"]) == 0
    ckpt = os.path.join(out, "checkpoint_epoch_0")
    assert os.path.isdir(ckpt)
    assert main(args + ["--num_epochs", "2", "--checkpoint", ckpt]) == 0


@pytest.mark.slow
def test_context_parallel_via_cli(synth, tmp_path):
    """--context_parallel trains end-to-end (ring attention over the
    model axis of the 8-device CPU mesh) and --only_evaluate builds its
    eval step under the same mesh (VERDICT r2 item 4)."""
    images_dir, ann_file = synth
    out = str(tmp_path / "run_cp")
    args = [
        "--train_images", images_dir, "--train_annotations", ann_file,
        "--debug", "--debug_samples", "8", "--lightweight",
        "--image_size", "56", "--batch_size", "4", "--num_classes", "6",
        "--output_dir", out, "--val_frequency", "100",
        "--model_parallel", "2", "--context_parallel",
    ]
    assert main(args + ["--num_epochs", "1"]) == 0
    hist_file = os.path.join(out, "checkpoint_epoch_0", "metrics_history.json")
    with open(hist_file) as f:
        hist = json.load(f)
    assert np.isfinite(hist["train_loss"][0])
    # Eval path under the CP mesh (previously built without a mesh).
    assert main([
        "--only_evaluate", "--val_images", images_dir,
        "--val_annotations", ann_file,
        "--lightweight", "--image_size", "56", "--batch_size", "4",
        "--num_classes", "6", "--output_dir", str(tmp_path / "run_cp_eval"),
        "--model_parallel", "2", "--context_parallel",
    ]) == 0


@pytest.mark.slow
def test_pipeline_parallel_via_cli(synth, tmp_path):
    """--pipeline_parallel trains end-to-end: backbone depth split into
    --model_parallel GPipe stages on the 8-device CPU mesh."""
    images_dir, ann_file = synth
    out = str(tmp_path / "run_pp")
    assert main([
        "--train_images", images_dir, "--train_annotations", ann_file,
        "--debug", "--debug_samples", "8", "--lightweight",
        # batch must divide data_shards (4) x microbatches (2)
        "--image_size", "56", "--batch_size", "8", "--num_classes", "6",
        "--output_dir", out, "--val_frequency", "100",
        "--model_parallel", "2", "--pipeline_parallel",
        "--pipeline_microbatches", "2", "--num_epochs", "1",
    ]) == 0
    hist_file = os.path.join(out, "checkpoint_epoch_0", "metrics_history.json")
    with open(hist_file) as f:
        hist = json.load(f)
    assert np.isfinite(hist["train_loss"][0])


def test_cp_pp_flags_exclusive():
    with pytest.raises(SystemExit):
        main(["--context_parallel", "--pipeline_parallel",
              "--only_evaluate"])


def test_backbone_dtype_flag_sets_config():
    from dinov2_od_tpu.train.cli import build_arg_parser, build_detector_config

    p = build_arg_parser()
    args = p.parse_args(["--lightweight", "--backbone_dtype", "bfloat16"])
    cfg = build_detector_config(args)
    assert cfg.backbone.dtype == "bfloat16"
    args = p.parse_args(["--lightweight"])
    assert build_detector_config(args).backbone.dtype == "float32"
