"""tcct_tpu — TPU-native OCT retinal-layer segmentation framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the
TCCT reference (MICCAI2022 GOALS solution / TMI2023 paper code):

- ``models``  — MPViT + CrossCNN dual-branch FTC segmentation zoo, ReLayNet
  baseline, Task-2 ResNet classifier (reference: task1/nets/, task2/).
- ``losses``  — Dice/IoU multi-class losses, boundary-regression loss,
  feature-polarization prototype losses (reference: task1/kite/losses/,
  task1/nets/{reg,fcp,fcs}.py).
- ``data``    — device-resident OCT data pipeline with a jitted on-device
  augmentation graph (reference: task1/data/).
- ``train``   — fit/val/predict engine, AdamW + cyclic LR, checkpointing
  (reference: task1/kite/).
- ``infer``   — jit-compiled batched volume predictor + torch-checkpoint
  importer (reference: task1/onnx/).
- ``ops``     — TPU kernels (XLA + Pallas) for the hot paths.

Everything under a train/eval step is functional and jit/pjit-compatible;
data parallelism is expressed with ``jax.sharding`` over a device mesh.
"""

__version__ = "0.1.0"
