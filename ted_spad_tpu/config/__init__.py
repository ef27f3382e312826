from ted_spad_tpu.config.paths import PathConfig, default_paths
from ted_spad_tpu.config.params import (
    ActionParams,
    AnonymizationParams,
    FeatureExtractionParams,
    MGFNParams,
    PrivacyParams,
    ReconstructionParams,
    StageParams,
    VideoParams,
    apply_params_file,
    load_params_module,
)

__all__ = [
    "PathConfig",
    "default_paths",
    "ActionParams",
    "AnonymizationParams",
    "FeatureExtractionParams",
    "MGFNParams",
    "PrivacyParams",
    "ReconstructionParams",
    "StageParams",
    "VideoParams",
    "apply_params_file",
    "load_params_module",
]
