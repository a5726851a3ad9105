"""Unified typed configuration tree with YAML loading.

Replaces the reference's three config mechanisms — per-node YAML files
keyed by WORK_SPACE_PATH (front_end.cpp:28-86), ROS params
(front_end_node.cpp:22-24), and the compile-time WORK_SPACE_PATH injection
(cmake/global_defination.cmake:1-5) — with one dataclass tree that can be
constructed in code or loaded/overridden from a single YAML file.

YAML schema mirrors the frozen dataclass fields; unknown keys raise.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

from .models.graph_optimizer import GraphOptimizerConfig
from .models.registration.icp import ICPConfig
from .models.registration.ndt import NDTConfig
from .models.scan_context import ScanContextConfig
from .pipeline.back_end import BackEndConfig
from .pipeline.data_pretreat import DataPretreatConfig
from .pipeline.front_end import FrontEndConfig
from .pipeline.loop_closing import LoopClosingConfig
from .pipeline.matching import MatchingConfig
from .pipeline.viewer import ViewerConfig


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    """Top-level configuration for the full mapping + localization system."""

    data_pretreat: DataPretreatConfig = DataPretreatConfig()
    front_end: FrontEndConfig = FrontEndConfig()
    back_end: BackEndConfig = BackEndConfig()
    loop_closing: LoopClosingConfig = LoopClosingConfig()
    viewer: ViewerConfig = ViewerConfig()
    matching: MatchingConfig = MatchingConfig()
    data_dir: str = "slam_data"


_NESTED = {
    "ndt": NDTConfig,
    "icp": ICPConfig,
    "sc": ScanContextConfig,
    "optimizer": GraphOptimizerConfig,
}


def _build(cls, data: dict):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in data.items():
        if key not in fields:
            raise KeyError(f"{cls.__name__}: unknown config key '{key}'")
        ftype = fields[key].type
        if isinstance(value, dict):
            sub = _NESTED.get(key)
            if sub is None:
                sub = fields[key].default.__class__
            kwargs[key] = _build(sub, value)
        elif isinstance(value, list):
            kwargs[key] = tuple(value)
        else:
            kwargs[key] = value
    return cls(**kwargs)


def load_config(path: Optional[str] = None, overrides: Optional[dict] = None) -> SlamConfig:
    """Load SlamConfig from YAML (optional) with dict overrides (optional)."""
    data: dict[str, Any] = {}
    if path is not None:
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f) or {}
    if overrides:
        def merge(a, b):
            out = dict(a)
            for k, v in b.items():
                out[k] = merge(a.get(k, {}), v) if isinstance(v, dict) and isinstance(a.get(k), dict) else v
            return out

        data = merge(data, overrides)
    sections = {}
    top = {f.name: f for f in dataclasses.fields(SlamConfig)}
    for key, value in data.items():
        if key not in top:
            raise KeyError(f"SlamConfig: unknown section '{key}'")
        if isinstance(value, dict):
            sections[key] = _build(top[key].default.__class__, value)
        else:
            sections[key] = value
    return SlamConfig(**sections)
