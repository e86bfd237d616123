"""NIMA training sub-pipeline (capability parity with the vendored nima
package — reference: metrics/NIMA/nima/, SURVEY.md C16): AVA dataset
cleaning/splitting, EMD-loss training of the MobileNetV2 scorer, validation,
and single-image scoring, all JAX/TPU-native."""

from uegan_tpu.nima_train.dataset import AVADataset, clean_and_split
from uegan_tpu.nima_train.train import train_nima, validate_nima

__all__ = ["AVADataset", "clean_and_split", "train_nima", "validate_nima"]
