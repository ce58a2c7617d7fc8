"""vipers — VIsion Pruning & Evaluation of Representations, TPU-native.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
EIDOSLAB/pruning-for-vision-representation (the research codebase of
"When Does Pruning Benefit Vision Representations?", ICIAP 2025):

* prune ImageNet classifiers (ResNet-18/50, ViT-B/16, ViT-B/32, DINO ViTs,
  VGG16, Swin-V2-T) with SNIP or iterative global L1 magnitude pruning,
* fine-tune with masked gradients so pruned weights stay exactly zero,
* evaluate the pruned representations downstream:
  - ImageNet top-1/top-5,
  - LOST unsupervised object discovery (CorLoc on VOC07/VOC12/COCO20k),
  - explainability quality (GradCAM / Guided-GradCAM / Integrated Gradients /
    attention heatmaps, scored by relevance-mass / relevance-rank accuracy),
  - int8 quantization (QAT + PTQ),
* plot everything as sparsity-vs-metric curves.

Unlike the reference (single-GPU PyTorch with a file-based tensor side
channel), every compute path here is a pure jitted function designed for the
TPU: masks fuse into convs/matmuls, models return (logits, qkv, attention)
directly, and scaling happens through `jax.sharding.Mesh` + collectives.
"""

__version__ = "0.1.0"
