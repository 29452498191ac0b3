"""spacap3d_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
spatiality-guided 3D dense captioning on point clouds, with the full
capabilities of the reference CUDA/PyTorch implementation (SpaCap3D,
IJCAI 2022): a VoteNet-style detector over 40k-point ScanNet scenes, a
spatiality-guided transformer captioner, detection + captioning +
spatial-relation training losses, and a bit-exact caption/detection
evaluation harness (CIDEr/BLEU/METEOR/ROUGE + mAP@IoU).
"""

__version__ = "0.1.0"

from spacap3d_tpu.config import (  # noqa: F401
    DataConfig,
    ModelConfig,
    RunConfig,
    TrainConfig,
)
