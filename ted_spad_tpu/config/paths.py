"""Dataset/artifact path configuration.

TPU-native equivalent of the reference's ``aux_code/config.py`` (config.py:1-24): one central,
overridable place for dataset roots and artifact directories. Unlike the reference (edit-in-place
module constants) this is a dataclass that can be constructed from env vars or a dict, so runs
are reproducible without mutating the source tree.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path


@dataclasses.dataclass
class PathConfig:
    # Dataset roots (reference aux_code/config.py:4-20).
    ucf_crimes_path: str = "/data/UCF_Crimes"
    xd_path: str = "/data/XD_Violence"
    shanghai_path: str = "/data/shanghaitech"
    vispr_path: str = "/data/vispr_resized"
    ucf101_path: str = "/data/UCF101"

    # Artifact dirs (reference aux_code/config.py:22-23).
    saved_models_dir: str = "saved_models"
    logs_dir: str = "logs"
    features_dir: str = "features"

    @property
    def action_splits_path(self) -> str:
        return os.path.join(self.ucf_crimes_path, "Action_Regnition_splits")

    @property
    def class_idx_path(self) -> str:
        return os.path.join(self.action_splits_path, "ClassIDs.txt")

    @property
    def ucf101_class_mapping(self) -> str:
        return os.path.join(self.ucf101_path, "ucfTrainTestlist", "action_classes.json")

    @classmethod
    def from_env(cls, prefix: str = "TEDSPAD_") -> "PathConfig":
        """Build from environment variables, e.g. TEDSPAD_UCF101_PATH."""
        kwargs = {}
        for f in dataclasses.fields(cls):
            env_key = prefix + f.name.upper()
            if env_key in os.environ:
                kwargs[f.name] = os.environ[env_key]
        return cls(**kwargs)

    @classmethod
    def from_file(cls, path: str | Path) -> "PathConfig":
        with open(path) as fh:
            return cls(**json.load(fh))

    def ensure_dirs(self) -> None:
        for d in (self.saved_models_dir, self.logs_dir, self.features_dir):
            Path(d).mkdir(parents=True, exist_ok=True)


def default_paths() -> PathConfig:
    return PathConfig.from_env()
