"""Tools tests: analyze_results on real artifacts, download arg handling."""

import json
import os

import numpy as np
import pytest

from dinov2_od_tpu.data.synthetic import write_coco_dataset
from dinov2_od_tpu.tools.analyze import analyze_metrics, main as analyze_main


def test_analyze_metrics_outputs_chart(tmp_path):
    metrics = {"AP": 0.42, "AP50": 0.6, "AP75": 0.4, "APs": 0.1,
               "APm": 0.45, "APl": 0.55}
    f = tmp_path / "metrics_epoch_1.json"
    f.write_text(json.dumps(metrics))
    out = analyze_metrics(str(f))
    assert out == metrics
    assert (tmp_path / "metrics_chart.png").exists()


def test_analyze_predictions_visualization(tmp_path):
    images_dir, ann_file = write_coco_dataset(str(tmp_path), num_images=4, seed=2)
    with open(ann_file) as f:
        gt = json.load(f)
    preds = [
        {"image_id": a["image_id"], "category_id": a["category_id"],
         "bbox": a["bbox"], "score": 0.9}
        for a in gt["annotations"]
    ]
    pred_file = tmp_path / "preds.json"
    pred_file.write_text(json.dumps(preds))
    rc = analyze_main([
        "--predictions_file", str(pred_file),
        "--test_images", images_dir,
        "--annotations", ann_file,
        "--num_samples", "2",
    ])
    assert rc == 0
    assert (tmp_path / "confidence_histogram.png").exists()
    assert (tmp_path / "class_distribution.png").exists()
    vizzes = [f for f in os.listdir(tmp_path) if f.startswith("viz_")]
    assert len(vizzes) == 2


def test_analyze_requires_an_action():
    with pytest.raises(SystemExit):
        analyze_main([])


def test_download_requires_a_split():
    from dinov2_od_tpu.tools.download import main as dl_main

    with pytest.raises(SystemExit):
        dl_main(["--data_dir", "/tmp/nope"])
