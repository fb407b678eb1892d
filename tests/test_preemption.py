"""Preemption-safe training: SIGTERM -> checkpoint -> clean exit -> resume.

The reference handles no signals at all (train.py:1279-1288 saves only on
its epoch cadence); these pin OUR semantics: the guard latches the signal,
the loop checkpoints at the next step boundary, and --checkpoint resume
restarts the interrupted epoch.
"""

import logging
import os
import signal

import pytest

from dinov2_od_tpu.data.synthetic import write_coco_dataset
from dinov2_od_tpu.train.cli import main
from dinov2_od_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint
from dinov2_od_tpu.train.preemption import PreemptionGuard


def test_guard_latches_signal_and_restores_handler():
    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert not guard.triggered
        signal.raise_signal(signal.SIGTERM)
        assert guard.triggered
        # Latched: the flag stays set.
        assert guard.triggered
    assert signal.getsignal(signal.SIGTERM) is before


class _SignalOnFirstBatch(logging.Handler):
    """Raises SIGTERM from inside the first per-batch log record — i.e.
    deterministically mid-epoch, on the main thread, after the guard is
    installed (the loop installs it before any batch logging)."""

    def __init__(self):
        super().__init__()
        self.fired = False

    def emit(self, record):
        if not self.fired and "batch 0/" in record.getMessage():
            self.fired = True
            signal.raise_signal(signal.SIGTERM)


def test_sigterm_checkpoints_and_resume_restarts_epoch(tmp_path):
    images_dir, ann_file = write_coco_dataset(
        str(tmp_path / "d"), num_images=8, image_size=56, seed=0
    )
    out = str(tmp_path / "out")
    args = [
        "--train_images", images_dir, "--train_annotations", ann_file,
        "--lightweight", "--image_size", "56", "--batch_size", "4",
        "--num_epochs", "2", "--output_dir", out,
        "--checkpoint_frequency", "100", "--val_frequency", "100",
    ]

    trigger = _SignalOnFirstBatch()
    # Root logger: setup_logger clears the package logger's handlers, but
    # propagation is on, so root receives every record.
    logging.getLogger().addHandler(trigger)
    try:
        rc = main(args)
    finally:
        logging.getLogger().removeHandler(trigger)
    assert rc == 0 and trigger.fired
    # SIGTERM handler was restored after the loop.
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler, signal.getsignal(signal.SIGTERM)
    )

    # Preempted mid-epoch-0: checkpoint written, no final model.
    ckpt = latest_checkpoint(out)
    assert ckpt is not None and ckpt.endswith("checkpoint_epoch_0")
    assert not os.path.isdir(os.path.join(out, "final_model"))
    # Metadata says epoch -1 -> resume restarts epoch 0.
    import jax

    from dinov2_od_tpu.config import lightweight_detector_config
    from dinov2_od_tpu.models import init_detector_params

    cfg = lightweight_detector_config(num_classes=91, image_size=56)
    template = init_detector_params(jax.random.key(0), cfg)
    _, _, start_epoch, _ = restore_checkpoint(ckpt, template, None)
    assert start_epoch == 0

    # Resume completes the run cleanly and writes the final model.
    rc = main(args + ["--checkpoint", ckpt])
    assert rc == 0
    assert os.path.isdir(os.path.join(out, "final_model"))


def test_preempted_resume_is_exact(tmp_path):
    """Mid-epoch preempt + resume reproduces the uninterrupted run: the
    preemption checkpoint records the batch index, the loader
    fast-forwards there, and state.step restore continues the per-step
    rng stream — so the final weights match exactly."""
    import jax
    import numpy as np

    from dinov2_od_tpu.config import lightweight_detector_config
    from dinov2_od_tpu.models import init_detector_params

    images_dir, ann_file = write_coco_dataset(
        str(tmp_path / "d"), num_images=16, image_size=56, seed=1
    )

    def run_args(out):
        return [
            "--train_images", images_dir, "--train_annotations", ann_file,
            "--lightweight", "--image_size", "56", "--batch_size", "4",
            "--num_epochs", "2", "--output_dir", out,
            "--checkpoint_frequency", "100", "--val_frequency", "100",
        ]

    def final_params(out):
        cfg = lightweight_detector_config(num_classes=91, image_size=56)
        template = init_detector_params(jax.random.key(0), cfg)
        p, _, _, _ = restore_checkpoint(
            os.path.join(out, "final_model"), template, None
        )
        return p

    out_a = str(tmp_path / "a")
    assert main(run_args(out_a)) == 0

    out_b = str(tmp_path / "b")
    trigger = _SignalOnFirstBatch()
    logging.getLogger().addHandler(trigger)
    try:
        assert main(run_args(out_b)) == 0
    finally:
        logging.getLogger().removeHandler(trigger)
    assert trigger.fired
    ckpt = latest_checkpoint(out_b)
    assert ckpt is not None
    # The preemption sidecar recorded a mid-epoch position.
    import json

    with open(os.path.join(ckpt, "metrics_history.json")) as f:
        assert json.load(f)["_preempt_batch_index"] == 2  # 4 batches/epoch
    assert main(run_args(out_b) + ["--checkpoint", ckpt]) == 0

    la = jax.tree_util.tree_leaves(final_params(out_a))
    lb = jax.tree_util.tree_leaves(final_params(out_b))
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
