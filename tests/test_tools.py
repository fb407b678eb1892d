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


def test_extract_archive_debug_partial(tmp_path):
    """Debug-mode partial extraction (reference train.py:352-409):
    image archives extract only max_samples .jpg files, plus every
    directory and non-image file."""
    import zipfile

    from dinov2_od_tpu.tools.download import extract_archive

    archive = tmp_path / "val_images.zip"
    with zipfile.ZipFile(archive, "w") as z:
        z.writestr("val2017/", "")
        for i in range(10):
            z.writestr(f"val2017/{i:012d}.jpg", b"fakejpg")
        z.writestr("val2017/readme.txt", "meta")

    out = tmp_path / "out"
    assert extract_archive(str(archive), str(out), max_samples=3)
    jpgs = [p for p in (out / "val2017").iterdir() if p.suffix == ".jpg"]
    assert len(jpgs) == 3
    assert (out / "val2017" / "readme.txt").exists()

    # Non-image archives (no 'images' in the name) extract fully.
    ann = tmp_path / "annotations.zip"
    with zipfile.ZipFile(ann, "w") as z:
        for i in range(5):
            z.writestr(f"annotations/f{i}.json", "{}")
    out2 = tmp_path / "out2"
    assert extract_archive(str(ann), str(out2), max_samples=1)
    assert len(list((out2 / "annotations").iterdir())) == 5
