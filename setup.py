"""Package metadata (reference: setup.py — package dino_detector v0.1.0).

Core deps (jax, flax, optax, orbax, numpy, Pillow) are assumed present in
the target environment; nothing exotic is required. torch/transformers are
optional (only the pretrained-weight importer uses them)."""

from setuptools import find_packages, setup

setup(
    name="dinov2_od_tpu",
    version="0.1.0",
    description=(
        "TPU-native DINOv2 + DETR object detection framework "
        "(JAX / XLA / Pallas)"
    ),
    packages=find_packages(include=["dinov2_od_tpu*", "dino_detector*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "optax",
        "orbax-checkpoint",
        "numpy",
        "Pillow",
        "tqdm",
    ],
    extras_require={
        "import": ["torch", "transformers", "safetensors"],
        "viz": ["matplotlib", "tensorboard"],
    },
    entry_points={
        "console_scripts": [
            "dinov2-od-train=dinov2_od_tpu.train.cli:main",
            "dinov2-od-download=dinov2_od_tpu.tools.download:main",
            "dinov2-od-serve=dinov2_od_tpu.serve:main",
        ]
    },
)
