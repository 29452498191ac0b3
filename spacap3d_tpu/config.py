"""Configuration for the SpaCap3D-TPU framework.

Replaces the reference's two-tier config (global EasyDict `CONF` in
lib/config.py + per-script argparse) with typed dataclasses that are
serialized into every run directory.  Knob names are kept 1:1 with the
reference CLI flags (see /root/reference/scripts/train.py:352-398) so
reference commands map directly onto this framework.
"""
from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

# Repo-internal metadata (ScanNet class maps, mean sizes, split lists).
META_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "meta")

# Special vocabulary tokens (reference lib/dataset.py:134-144).
PAD_ID = 0
UNK_ID = 1
SOS_ID = 2
EOS_ID = 3
SPECIAL_TOKENS = ("pad_", "unk", "sos", "eos")

# Training-time constants (reference lib/config.py:53-63).
MAX_DES_LEN = 30          # max caption tokens (excluding sos/eos)
MAX_NUM_OBJ = 128         # max GT objects per scene
GT_VOTE_FACTOR = 3        # replicated GT votes per point
DEFAULT_SEED = 42
TRAIN_MIN_IOU = 0.25
EVAL_MIN_IOU = 0.5
MEAN_COLOR_RGB = (109.8, 97.2, 83.8)


@dataclass(frozen=True)
class ModelConfig:
    """Static architecture hyper-parameters (shapes are all fixed for XLA)."""

    # Detector trunk (reference models/backbone_module.py:28-66).
    num_points: int = 40000
    input_feature_dim: int = 1          # height only by default (no_height=False)
    num_proposals: int = 256
    num_heading_bin: int = 1
    num_size_cluster: int = 18
    num_class: int = 18
    vote_factor: int = 1

    # Backbone SA/FP architecture (defaults = reference backbone_module.py:28-66;
    # configurable so tests/small deployments can scale the trunk).
    sa_npoints: Tuple[int, ...] = (2048, 1024, 512, 256)
    sa_radii: Tuple[float, ...] = (0.2, 0.4, 0.8, 1.2)
    sa_nsamples: Tuple[int, ...] = (64, 32, 16, 16)
    sa_widths: Tuple[Tuple[int, ...], ...] = (
        (64, 64, 128), (128, 128, 256), (128, 128, 256), (128, 128, 256)
    )
    fp_width: int = 256                 # FP mlp hidden/out width
    seed_feature_dim: int = 256         # backbone output feature dim
    # Vote aggregation SA (reference proposal_module.py:34-41): widths end in
    # the proposal feature dim, which must equal the captioner d_model.
    agg_radius: float = 0.3
    agg_nsample: int = 16
    proposal_feature_dim: int = 128

    # Captioner (reference scripts/train.py:387-391 defaults).
    vocab_size: int = 4528
    num_layers: int = 6                 # --N
    num_heads: int = 8                  # --h
    d_model: int = 128
    d_ff: int = 2048
    transformer_dropout: float = 0.1
    # 'xyz' | 'center' | 'loc' | None (None == --no_learnt_src_pos)
    src_pos_type: Optional[str] = "xyz"
    use_transformer_encoder: bool = True   # not --no_enc
    early_guide: bool = True               # not --late_guide
    check_relation: bool = True            # not --no_relation
    no_caption: bool = False

    max_des_len: int = MAX_DES_LEN
    max_num_obj: int = MAX_NUM_OBJ

    # Numerics: keep f32 weights; bf16 activations on matmul-heavy paths.
    use_bf16: bool = False
    # Greedy-decode activation/KV-cache dtype. TPU matmuls already run
    # bf16 MXU passes at default precision; this additionally halves the
    # HBM traffic of the decode loop (weights, KV caches, residual
    # stream). Logits accumulate in f32 and argmax runs on f32, so token
    # outputs match the f32 path away from exact ties (tested). Parity
    # tests against the torch reference pin "float32".
    eval_decode_dtype: str = "bfloat16"
    # Staged greedy decode: the KV caches start short and grow across
    # this many scan stages (step i only attends to positions <= i), which
    # cuts the cache re-read traffic that bounds the decode ~1.6x.
    # 1 = single full-length scan.
    eval_decode_stages: int = 4
    # Opt-in stage-granular early exit: once EVERY decoded row has emitted
    # EOS, the remaining scan stages are skipped (lax.cond — one branch
    # executes at runtime) and their token slots filled with EOS. Final
    # captions are identical (the harness truncates at the first EOS);
    # the RAW lang_cap tensor differs after the all-EOS point, which is
    # why this defaults off: the reference-parity tests pin full 31-token
    # sequences. With trained weights real captions end at ~10-15 of 31
    # steps, so production eval skips most of the decode tail. No effect
    # on a model that never emits EOS (stage 1 always runs).
    eval_decode_early_exit: bool = False
    # Fused Pallas decode kernels (ops/decode_pallas.py): keep the
    # generator logits (R x vocab f32, ~37 MB/step) and each layer's FFN
    # hidden (R x d_ff, ~8.4 MB/step) VMEM-resident instead of
    # materializing them in HBM. MEASURED NEGATIVE at flagship shapes
    # (README "negative results"): each Mosaic call inside the scan
    # carries ~20 us entry overhead x (6 FFN + 1 generator) x 31 steps,
    # outweighing the HBM it saves — eval forward 194 -> 167 scenes/s
    # with both on (171.5 gen-only, 184.8 ffn-only). Kept for bigger
    # configs (d_ff/vocab scale the savings, the overhead is fixed);
    # engages only for a bf16 decode on a TPU backend.
    eval_decode_fused: bool = False

    @property
    def size_decoded(self) -> bool:
        # reference models/SpaCapNet.py:39
        return self.src_pos_type == "loc"


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 8
    epoch: int = 50
    lr: float = 1e-3
    transformer_lr: float = 1e-3
    wd: float = 1e-5
    seed: int = DEFAULT_SEED
    val_step: int = 2000
    verbose: int = 1000
    criterion: str = "cider"
    no_detection: bool = False   # freeze detector trunk
    no_caption: bool = False     # detection-only pretraining mode
    use_relation: bool = True
    # detection-only pretraining schedules (reference scripts/train.py:260-263)
    lr_decay_step: Tuple[int, ...] = (80, 120, 160)
    lr_decay_rate: float = 0.1
    bn_decay_step: int = 20
    bn_decay_rate: float = 0.5
    # model_last.ckpt cadence in epochs (1 = the reference's every-epoch
    # save, lib/solver.py:216-225; raise for many-epoch synthetic runs
    # where the per-epoch host snapshot dominates)
    ckpt_every: int = 1


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "ScanRefer"     # or "ReferIt3D"
    data_root: str = os.environ.get("SPACAP_DATA_ROOT", "data")
    num_points: int = 40000
    use_height: bool = True
    use_color: bool = False
    use_normal: bool = False
    use_multiview: bool = False
    augment: bool = True
    use_relation: bool = True
    num_workers: int = 4
    max_des_len: int = MAX_DES_LEN

    @property
    def scannet_data(self) -> str:
        return os.path.join(self.data_root, "scannet", "scannet_data")

    @property
    def input_feature_dim(self) -> int:
        return (
            128 * int(self.use_multiview)
            + 3 * int(self.use_normal)
            + 3 * int(self.use_color)
            + int(self.use_height)
        )


@dataclass(frozen=True)
class RunConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    output_dir: str = "outputs"
    tag: str = ""

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @staticmethod
    def load(path: str) -> "RunConfig":
        with open(path) as f:
            raw = json.load(f)
        return RunConfig(
            model=ModelConfig(**raw["model"]),
            train=TrainConfig(
                **{k: tuple(v) if isinstance(v, list) else v for k, v in raw["train"].items()}
            ),
            data=DataConfig(**raw["data"]),
            output_dir=raw.get("output_dir", "outputs"),
            tag=raw.get("tag", ""),
        )
