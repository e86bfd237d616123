"""uegan_tpu — a TPU-native (JAX/XLA/Pallas/GSPMD) unsupervised image-enhancement
framework with the full capability surface of UEGAN (eezkni/UEGAN, IEEE T-IP 2020).

Layers (all NHWC, bfloat16/float32, designed for the MXU + GSPMD):

- :mod:`uegan_tpu.ops`       low-level TPU ops (reflection pad, align-corners
  resize, instance/batch norm, spectral norm, pooling, Pallas kernels)
- :mod:`uegan_tpu.models`    Flax modules: Generator (U-Net + GAM), multi-scale
  Discriminator, VGG19 feature extractor, NIMA (MobileNetV2) scorer
- :mod:`uegan_tpu.losses`    pure-function GAN losses (ls/original/w/hinge/
  rahinge/rals), instance-normalized perceptual loss, multi-scale
  reconstruction loss, TV/angular/EMD losses
- :mod:`uegan_tpu.data`      host-side deterministic input pipeline
- :mod:`uegan_tpu.parallel`  mesh construction + sharding rules (data parallel,
  spatial/halo sharding for high-res inference)
- :mod:`uegan_tpu.train`     single-jit GAN train step, on-device image pool,
  LR schedules, Trainer/Tester engines
- :mod:`uegan_tpu.metrics`   PSNR/SSIM/NIMA, both batched on-device and in the
  reference's disk/CSV protocol
- :mod:`uegan_tpu.utils`     checkpointing (orbax), TensorBoard logging, seeds,
  image IO
- :mod:`uegan_tpu.convert`   torch ``.pth`` checkpoint importers
"""

__version__ = "0.1.0"

from uegan_tpu.config import Config, get_config  # noqa: F401
