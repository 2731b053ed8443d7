"""ddti_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for binary
thyroid-nodule ultrasound segmentation on DDTI.

This is a ground-up TPU-first rebuild of the capability surface of the PyTorch
reference ``WuJiaqiii/Thyroid-nodule-image-segmentation-UNet-DDTI`` (see
SURVEY.md at the repo root for the full component inventory):

- ``models``   — the seven-architecture UNet-family zoo (flax.linen, NHWC,
                 bf16-friendly) plus the legacy variants.
- ``losses``   — Dice / BCE / Focal-Tversky / Boundary (with an on-device
                 Euclidean distance transform) and the composite loss.
- ``ops``      — TPU compute kernels: separable EDT (Pallas min-plus), CLAHE,
                 paired-image resampling (rotate / elastic remap), attention.
- ``data``     — filename-paired dataset, host decode, fully on-device batched
                 augmentation pipeline with a PIL/cv2 host oracle for parity.
- ``train``    — pjit data-parallel train/val engine, AdamW + cosine warm
                 restarts, early stopping, Orbax + ``.pth`` checkpointing.
- ``eval``     — global pixel metrics, marching-squares contour overlays.
- ``parallel`` — mesh construction and sharding rules (DP + spatial).
- ``cli``      — ``main`` (train/test), param counter, sweep runner, config
                 splitter mirroring the reference's run.sh/test.sh/cut.py.
"""

__version__ = "0.1.0"
