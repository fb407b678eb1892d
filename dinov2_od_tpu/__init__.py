"""dinov2_od_tpu — TPU-native object detection framework.

A ground-up JAX/XLA/Pallas re-design of the DINOv2 + DETR-style object
detection pipeline (reference capability surface: mudit1729/dinov2-od):

- Frozen DINOv2 ViT backbone with LoRA adapters on the last encoder blocks
  (reference: dino_detector/models/dinov2_backbone.py).
- DETR decoder with learned object queries; standard or deformable
  cross-attention (reference: dino_detector/models/detr_decoder.py,
  deformable_attention.py).
- Hungarian-matched set-prediction loss (focal CE + L1 + GIoU), computed
  fully on device — batched JV assignment, no scipy host round-trip
  (reference: dino_detector/matching.py, losses.py).
- COCO data pipeline with static-shape padded targets, COCO mAP evaluation,
  Orbax checkpointing, TensorBoard logging, and a CLI mirroring the
  reference `dino_detector.train` flag surface (reference: train.py).

Everything in the compute path is jit-stable (static shapes, lax control
flow) and shards over a `jax.sharding.Mesh` for data/tensor parallelism.
"""

__version__ = "0.1.0"
