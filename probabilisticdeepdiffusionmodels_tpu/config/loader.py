"""Config-group composition + CLI overrides (hydra-equivalent surface).

The reference composes configs with Hydra 1.1 (reference:
config/default.yaml:13-18 selects groups model/data/visualization/engine/
scheduler; CLI overrides like ``model=unet data=cifar10 engine.mode=cosine``,
scripts/train.py:64).  Hydra isn't a dependency here; this loader implements
the same composition semantics over plain PyYAML:

  * a root yaml with a ``defaults`` list of {group: choice} entries;
  * group yamls at <config_dir>/<group>/<choice>.yaml loaded under that key;
  * overrides ``group=choice`` (re-selects a group file) and
    ``a.b.c=value`` (dotted deep-set, YAML-parsed scalars);
  * ``key=null`` yields None.
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import yaml

CONFIG_DIR = Path(__file__).parent

__all__ = ["load_config", "CONFIG_DIR", "deep_set", "to_dict"]


def _load_yaml(path: Path) -> dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def deep_set(cfg: dict, dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        if k not in node or not isinstance(node[k], dict):
            node[k] = {}
        node = node[k]
    node[keys[-1]] = value


def _parse_value(raw: str) -> Any:
    return yaml.safe_load(raw)


def load_config(
    root: str = "default",
    overrides: Optional[Sequence[str]] = None,
    config_dir: Optional[Path] = None,
) -> Dict[str, Any]:
    """Compose <config_dir>/<root>.yaml with its groups, then apply overrides."""
    config_dir = Path(config_dir) if config_dir else CONFIG_DIR
    cfg = _load_yaml(config_dir / f"{root}.yaml")
    defaults: List[dict] = cfg.pop("defaults", [])

    group_choice: Dict[str, str] = {}
    for entry in defaults:
        (group, choice), = entry.items()
        group_choice[group] = choice

    # group re-selections first (``model=unet_small``)
    kv_overrides = []
    for ov in overrides or []:
        key, _, raw = ov.partition("=")
        if "." not in key and (config_dir / key).is_dir():
            group_choice[key] = raw
        else:
            kv_overrides.append((key, _parse_value(raw)))

    for group, choice in group_choice.items():
        cfg[group] = _load_yaml(config_dir / group / f"{choice}.yaml")
        cfg.setdefault("_choices", {})[group] = choice

    for key, value in kv_overrides:
        deep_set(cfg, key, value)
    return cfg


def to_dict(cfg) -> dict:
    return copy.deepcopy(cfg)
