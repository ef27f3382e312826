"""Typed per-stage configuration.

Replaces the reference's two config conventions — plain-Python ``params_*.py`` constant modules
(e.g. anonymization_training/params_anonymization.py, action_training/params_action.py) and
MGFN's argparse ``option.py:4-65`` — with dataclasses that keep the *same field names*, so
reference param files remain loadable (see :func:`load_params_module`) and runs are drop-in.

Schedule arrays (``warmup_array``, ``cosine_lr_array``) are generated lazily from scalars rather
than stored, matching the reference's formulas (params_anonymization.py:36, 48).
"""

from __future__ import annotations

import dataclasses
import importlib.util
import math
import sys
from typing import Any, Sequence


def _linspace(a: float, b: float, n: int) -> list[float]:
    if n == 1:
        return [a]  # np.linspace(a, b, 1) == [a]
    step = (b - a) / (n - 1)
    return [a + step * i for i in range(n)]


@dataclasses.dataclass
class StageParams:
    """Fields shared by every training stage."""

    run_id: str = "run"
    num_workers: int = 4
    batch_size: int = 8
    v_batch_size: int = 8
    learning_rate: float = 1e-4
    num_epochs: int = 100
    data_percentage: float = 1.0

    # Augmentation resolution (reference reso_h/reso_w).
    reso_h: int = 224
    reso_w: int = 224

    # Validation augmentation.
    hflip: Sequence[int] = (0,)
    cropping_facs: Sequence[float] = (0.8,)

    # LR schedule scaffolding (params_action.py:27-40).
    warmup: int = 10
    lr_patience: int = 2
    lr_reduce_factor: float = 2.0
    lr_scheduler: str = "cosine"  # 'cosine' | 'patience_based' | 'loss_based' | 'warmup_drop'
    opt_type: str = "adam"  # 'adam' | 'adamw' | 'sgd'
    momentum: float = 0.9
    weight_decay: float = 1e-4
    val_freq: int = 5

    # Numerics: bf16 compute on TPU replaces the reference's AMP autocast+GradScaler
    # (train_action.py:53, 79-81) — bf16 needs no loss scaling.
    compute_dtype: str = "bfloat16"

    seed: int = 0

    @property
    def warmup_array(self) -> list[float]:
        # params_anonymization.py:36: np.linspace(0.01, 1, warmup) + 1e-9
        return [x + 1e-9 for x in _linspace(0.01, 1.0, self.warmup)]

    @property
    def cosine_lr_array(self) -> list[float]:
        # params_anonymization.py:48: 5-epoch linear ramp then half-cosine to ~0.
        ramp = _linspace(0.01, 1.0, 5)
        n = max(self.num_epochs - 5, 1)
        tail = [(math.cos(x) + 1) / 2 for x in _linspace(0, math.pi / 0.99, n)]
        return ramp + tail

    def replace(self, **kw: Any):
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass
class VideoParams(StageParams):
    """Clip-sampling fields shared by the UCF101 stages (params_action.py:12-17)."""

    num_classes: int = 102
    num_frames: int = 16
    fix_skip: int = 2
    num_modes: int = 5
    num_skips: int = 1
    min_crop_factor_training: float = 0.6
    temporal_align: bool = False
    weak_aug: bool = False
    frame_wise_aug: bool = False  # per-frame color jitter (ucf101_dl.py:127-135)
    no_ar_distortion: bool = False
    aspect_ratio_aug: bool = False
    ori_reso_h: int = 240
    ori_reso_w: int = 320


@dataclasses.dataclass
class ReconstructionParams(StageParams):
    """fa pretraining (fa_pretraining/parameters.py)."""

    run_id: str = "fa_recon"
    batch_size: int = 32
    learning_rate: float = 1e-3
    warmup: int = 5
    scheduled_drop: int = 5
    lr_patience: int = 0
    fix_skip: int = 2
    num_modes: int = 5
    num_skips: int = 1
    arch_fa: str = "unet++"


@dataclasses.dataclass
class ActionParams(VideoParams):
    """ft action training (action_training/params_action.py)."""

    run_id: str = "baseline_action"
    arch: str = "largei3d"
    saved_model: str | None = None
    restart: bool = False
    batch_size: int = 16
    v_batch_size: int = 16
    loss: str = "ce"
    temporal_loss: str | None = None  # 'trip' | 'con' | None
    temporal_loss_weight: float = 0.1
    temporal_distance: int | None = None
    triplet_loss_margin: float = 1.0
    ft_dropout: float = 0.0
    eval_only: bool = False
    three_crop: bool = False  # val five-crop-corner TTA (ucf101_dl.py:199-203, 297-320)
    val_freq: int = 3
    kin_pretrained: bool = False

    # Anonymized-eval variant (train_anonymized_action.py): run every clip through frozen fa.
    anonymized: bool = False
    # Reproduce the reference's scrambled fa-input reshape in the anonymized paths
    # (train_anonymized_action.py:47-58, val quirk train_anonymizer.py:240-243).
    quirk_compat: bool = False
    saved_model_fa: str | None = None
    arch_fa: str = "unet++"

    @property
    def val_array(self) -> list[int]:
        # params_action.py:44
        return [1] + [5 * x for x in range(1, 8)] + [2 * x for x in range(21, 25)]


@dataclasses.dataclass
class AnonymizationParams(VideoParams):
    """The core 3-model adversarial stage (anonymization_training/params_anonymization.py)."""

    run_id: str = "baseline_anonymization"
    arch_ft: str = "largei3d"
    arch_fa: str = "unet++"
    arch_fb: str = "r50"
    saved_model_fa: str | None = None
    saved_model_ft: str | None = None
    saved_model_fb: str | None = None

    num_pa: int = 7
    data_percentage_vispr: float = 1.0
    batch_size: int = 8
    batch_size_vispr: int = 12
    learning_rate: float = 1e-5
    loss: str = "ce"
    temporal_loss: str = "trip"
    weak_aug: bool = True

    # Scaled per-model LRs (params_anonymization.py:55-57).
    fa_lr_scale: float = 0.4
    fb_lr_scale: float = 1.0
    ft_lr_scale: float = 1.0

    # Adversarial loss composition (params_anonymization.py:58-61; train_anonymizer.py:119).
    ft_loss_weight: float = 0.7
    fb_loss_weight: float = 1.0
    temporal_loss_weight: float = 0.1
    triplet_loss_margin: float = 1.0
    temporal_distance: int | None = None

    # NT-Xent (train_anonymizer.py:82): temperature 0.1, dot-product similarity.
    nt_xent_temperature: float = 0.1
    nt_xent_cosine: bool = False

    # Microbatch gradient accumulation inside the jitted fa step (memory for
    # reference-scale batches on one chip; see stages/anonymization_training.py).
    accum_steps: int = 1

    # Rematerialization of fa/ft/fb activations in the adversarial backwards.
    # "auto" (default): off when the traced batch is small enough to fit a v5e's
    # HBM without it (measured: B=4 @ 16x224² fits and runs 16% faster un-remated,
    # 276 vs 329 ms/step; B=8 OOMs) — "on"/"off" force it. "blocks": save the fa
    # UNet++ block boundaries and rematerialize only within-block intermediates
    # (jax.checkpoint save_only_these_names policy; memory between on and off).
    remat: str = "auto"

    # Reproduce the reference's scrambled fa-input reshape (train_anonymizer.py:86-92;
    # SURVEY §3.1 ⚠) inside the jitted steps — for feature-level A/B debugging against
    # torch activations. Default off: the rebuild trains on clean RGB frames.
    quirk_compat: bool = False

    # Checkpoint gating (train_anonymizer.py:511): save best only above this top-1.
    save_acc_threshold: float = 0.6

    @property
    def learning_rate_fa(self) -> float:
        return self.fa_lr_scale * self.learning_rate

    @property
    def learning_rate_fb(self) -> float:
        return self.fb_lr_scale * self.learning_rate

    @property
    def learning_rate_ft(self) -> float:
        return self.ft_lr_scale * self.learning_rate

    # The reference's per-epoch LR scheduler block is commented out
    # (train_anonymizer.py:432-450): fa/fb/ft train at CONSTANT scaled LRs even though
    # params_anonymization.py:47 nominally says 'cosine'. Constant is the faithful
    # default; set use_lr_schedule=True to honor the params file's cosine array.
    use_lr_schedule: bool = False

    @property
    def val_array(self) -> list[int]:
        # train_anonymizer.py:401.
        return [1, 5, 10, 12, 15, 20, 25, 30, 35] + [40 + x * 2 for x in range(30)]


@dataclasses.dataclass
class PrivacyParams(StageParams):
    """fb privacy-attack evaluation (privacy_training/params_privacy.py)."""

    run_id: str = "default_privacy"
    saved_model: str | None = None  # fa checkpoint when anon=True
    anon: bool = False
    num_pa: int = 7
    batch_size: int = 32
    v_batch_size: int = 32
    learning_rate: float = 1e-3
    warmup: int = 5
    lr_reduce_factor: float = 5.0
    lr_patience: int = 0


@dataclasses.dataclass
class FeatureExtractionParams(StageParams):
    """Clip feature extraction (feature_extraction/params_feature_ex.py)."""

    run_id: str = "feature_extraction"
    num_classes: int = 102
    num_frames: int = 16
    fix_skip: int = 2
    batch_size: int = 1  # clips per device step; raise for TPU batching
    cropping_factor: float = 0.8
    no_ar_distortion: bool = False
    dataset: str = "ucf_crime"  # 'ucf_crime' | 'xd' | 'shanghai'
    anonymized: bool = True
    saved_model_fa: str | None = None
    saved_model_ft: str | None = None
    arch_fa: str = "unet++"
    arch_ft: str = "largei3d"
    # Reproduce the reference's extraction-side reshape quirk (dali_extraction.py:168-173:
    # clean per-frame fa, then a reinterpreting reshape scrambles what ft sees) for
    # feature-level A/B debugging. Default off: clean layout end to end.
    quirk_compat: bool = False
    # Skip the h264/hevc in-loop deblocking filter during host decode (+ non-bitexact
    # codec speedups). Measured ~8% faster software decode; NOT bit-exact with
    # reference decode — frames differ at sub-pixel level before the 224² resize.
    # Opt-in for decode-bound extraction.
    decode_fast: bool = False
    # TTA crop fan-out: 1 = center crop (the reference's only mode,
    # dali_extraction.py:38-50); 5 = four corners + center; 10 = those five + hflips
    # (the layout of the published MGFN feature releases). Features become
    # (num_clips, ncrops, 2048) per video; ~ncrops x the device compute per clip.
    ncrops: int = 1
    # Opt-in W8A8 int8 serving mode for the fa anonymizer (ops/quant_unetpp.py):
    # 'none' (default, bf16) | 'int8'. Calibrates activation scales on the first
    # ``quant_calib_batches`` batches of the run, then extracts with int8 MXU convs
    # (~1.6-1.8x the bf16 conv rate on v5e). Changes numerics at int8 resolution;
    # with ``quant_fidelity_check`` the driver measures feature cosine similarity
    # vs the bf16 path on the calibration batch and logs/returns it.
    quant: str = "none"
    quant_calib_batches: int = 2
    quant_fidelity_check: bool = True
    # Also quantize the ft feature path (ops/quant_i3d.py) when it is the standard
    # WrapperI3D — measured 1.3-1.6x on its 3D conv families. Ignored (with a log
    # line) for other ft architectures; fa quantization still applies.
    quant_ft: bool = True
    # DALI-equivalent windowing (dali_extraction.py:72-73): 16 frames, stride 2, step 32.
    @property
    def clip_stride(self) -> int:
        return self.fix_skip

    @property
    def clip_step(self) -> int:
        return self.num_frames * self.fix_skip


@dataclasses.dataclass
class MGFNParams:
    """MGFN anomaly stage (anomaly_detection_mgfn/option.py:4-65, config.py:4-12)."""

    feat_extractor: str = "largei3d"
    feature_size: int = 2048
    hiddensize: int = 512
    modality: str = "RGB"
    mag_ratio: float = 0.1
    seg_length: int = 32
    # Model structure (option.py:17-22).
    depths: tuple[int, int, int] = (3, 3, 2)
    mgfn_types: tuple[str, str, str] = ("gb", "fb", "fb")
    dims: tuple[int, int, int] = (64, 128, 1024)
    dim_head: int = 64
    ff_repe: int = 4
    local_kernel: int = 5
    dropout_rate: float = 0.7
    k: int = 3  # top-k snippet selection (mgfn.py:184)

    # Training (option.py:26-31; main.py:72). ``lr_schedule`` mirrors config.py:6's
    # per-epoch LR list ('[0.001]*15000' stepped per epoch, main.py:91-93); None = constant.
    lr: float = 1e-3
    lr_schedule: tuple | None = None
    batch_size: int = 16
    weight_decay: float = 5e-4
    max_epoch: int = 1000

    # Loss weights (train.py:74, 96-100).
    contrastive_margin: float = 200.0
    lambda_smooth: float = 8e-4
    lambda_sparse: float = 8e-3

    # Dataset (option.py:33-58; datasets/dataset.py:26-48).
    datasetname: str = "UCF"  # 'UCF' | 'ST' | 'XD'
    rgb_list: str = "data/ucf-i3d.list"
    test_rgb_list: str = "data/ucf-i3d-test.list"
    gt: str = "data/gt-ucf.npy"
    model_name: str = "mgfn_ucf"
    # Original frames covered per extracted clip when expanding clip scores to frame-level
    # gt: UCF/XD 32 (make_gt_ucf.py:25, make_gt_xd.py:26), ST 16 (make_gt_sh.py:32).
    frames_per_clip: int = 32
    seed: int = 0
    compute_dtype: str = "float32"  # MGFN is tiny; keep f32 (matches reference numerics)

    # Per-dataset blocks the reference keeps commented in/out of option.py:33-58.
    DATASET_PRESETS = {
        "UCF": dict(
            datasetname="UCF", feature_size=2048, frames_per_clip=32,
            rgb_list="data/ucf-i3d.list", test_rgb_list="data/ucf-i3d-test.list",
            gt="data/gt-ucf.npy", model_name="mgfn_ucf",
        ),
        "ST": dict(
            datasetname="ST", feature_size=2048, frames_per_clip=16,
            rgb_list="data/shanghai-i3d.list", test_rgb_list="data/shanghai-i3d-test.list",
            gt="data/gt-sh.npy", model_name="mgfn_sh",
        ),
        "XD": dict(
            datasetname="XD", feature_size=1024, frames_per_clip=32,
            rgb_list="data/xd-i3d.list", test_rgb_list="data/xd-i3d-test.list",
            gt="data/gt-xd.npy", model_name="mgfn_xd",
        ),
    }

    @classmethod
    def for_dataset(cls, name: str, **overrides: Any) -> "MGFNParams":
        """Preset constructor mirroring option.py:33-58's per-dataset blocks
        (XD: 1024-d features + PR-AUC model selection; ST: 16 frames/clip gt)."""
        key = {"ucf": "UCF", "st": "ST", "sh": "ST", "shanghai": "ST", "xd": "XD"}.get(
            name.lower(), name.upper()
        )
        if key not in cls.DATASET_PRESETS:
            raise ValueError(f"unknown MGFN dataset {name!r}; expected UCF, ST, or XD")
        return cls(**{**cls.DATASET_PRESETS[key], **overrides})

    @property
    def abnormal_split(self) -> int:
        # dataset.py:26-48: UCF 810 / ST 63 / XD 1905 abnormal-first list split.
        return {"UCF": 810, "ST": 63, "XD": 1905}[self.datasetname]

    def replace(self, **kw: Any):
        return dataclasses.replace(self, **kw)


def load_params_module(path: str) -> dict[str, Any]:
    """Import a reference-style ``params_*.py`` file and return its public constants.

    Drop-in equivalent of the reference's ``importlib.import_module(args.params...)``
    (train_anonymizer.py:564-566).
    """
    spec = importlib.util.spec_from_file_location("user_params", path)
    assert spec is not None and spec.loader is not None, f"cannot import {path}"
    mod = importlib.util.module_from_spec(spec)
    sys.modules["user_params"] = mod
    spec.loader.exec_module(mod)
    return {k: v for k, v in vars(mod).items() if not k.startswith("_")}


def apply_params_file(params, path: str | None):
    """Overlay a reference-style params file onto a typed dataclass, ignoring unknown keys."""
    if path is None:
        return params
    overrides = load_params_module(path)
    field_names = {f.name for f in dataclasses.fields(params)}
    known = {k: v for k, v in overrides.items() if k in field_names}
    return params.replace(**known)
