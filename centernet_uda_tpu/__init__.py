"""centernet_uda_tpu — TPU-native CenterNet + Unsupervised Domain Adaptation framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of the
``scheckmedia/centernet-uda`` reference framework (PyTorch/CUDA), designed
TPU-first:

- Backbones (ResNet, DLA-34+DCN, MobileNetV2, EfficientNet) as Flax modules
  in NHWC layout feeding the MXU.
- Deformable convolution (DCNv2) as an XLA/Pallas gather+bilinear+matmul op
  instead of the reference CUDA extension (``libs/DCNv2``).
- CenterNet decode (peak NMS + top-k) as one fused jitted XLA function
  (reference: ``backends/decode.py``).
- Pure-functional training steps (jit/pjit over a device mesh) replacing the
  stateful ``uda.base.Model`` step methods; data parallelism over the TPU
  mesh via ``jax.sharding`` instead of ``torch.nn.DataParallel``.
- COCO-format data pipeline, mAP evaluation and TensorBoard logging with the
  same config surface (``configs/defaults.yaml`` + experiment overlays) so
  reference experiment YAMLs run unchanged.
"""

__version__ = "0.1.0"
