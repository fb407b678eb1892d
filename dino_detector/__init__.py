"""Compatibility shim: the reference exposes `python -m dino_detector.train`
(dino_detector/train.py:1353). Users migrating from the PyTorch reference
keep their command lines; everything forwards to dinov2_od_tpu."""
