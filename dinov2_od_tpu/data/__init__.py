"""Data pipeline: COCO JSON parsing, image loading/preprocessing with
static-shape padded targets, synthetic fixtures, and batch assembly."""
