"""MADM-TPU: a TPU-native JAX/Flax/Pallas rebuild of MADM.

MADM ("Unsupervised Modality Adaptation with Text-to-Image Diffusion Models for
Semantic Segmentation", NeurIPS 2024) trains a diffusion-feature segmentation
model on labeled RGB and adapts it to depth / infrared / event modalities via
self-training UDA.  This package re-implements the full framework TPU-first:

- ``madm_tpu.models``     Flax SD-v1.4 VAE/UNet with feature taps, LoRA, prompt
                          conditioning, DAFormer head (reference:
                          ``modeling/`` in XiaRho/MADM).
- ``madm_tpu.ops``        Pallas/XLA kernels: flash attention, fused GN+SiLU,
                          DACS augmentations on device.
- ``madm_tpu.parallel``   GSPMD mesh utilities; data-parallel train step and
                          sharded sliding-window inference.
- ``madm_tpu.train``      Criterion, EMA, optimizer groups, UDA train step,
                          trainer loop (reference: ``engine/``,
                          ``modeling/criterion.py``).
- ``madm_tpu.data``       CrossModalityDataset + rare-class sampling
                          (reference: ``data/``).
- ``madm_tpu.evaluation`` Conf-matrix mIoU evaluator + inference driver
                          (reference: ``evaluation/``).
- ``madm_tpu.checkpoint`` Orbax checkpointing + torch ``.pth`` converters
                          (reference: ``checkpoint/``).
- ``madm_tpu.config``     Detectron2-LazyConfig-style Python config system
                          (reference: ``config/``).
"""

__version__ = "0.1.0"
