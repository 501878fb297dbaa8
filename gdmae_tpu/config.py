"""YAML config system.

Preserves the reference's public config API (reference: pcdet/config.py):
  * a global ``cfg`` EasyDict,
  * ``_BASE_CONFIG_`` single-level inheritance (cfg_from_yaml_file /
    merge_new_config, reference pcdet/config.py:51-85),
  * dot-path CLI overrides with literal-eval type checking (cfg_from_list,
    reference pcdet/config.py:16-48),
so the shipped ``gd_mae.yaml``-family configs run unchanged.
"""
from __future__ import annotations

import ast
from pathlib import Path

import yaml


class EasyDict(dict):
    """Minimal attribute-access dict (drop-in for the ``easydict`` package,
    which isn't available in this environment). Nested dicts/lists are
    converted recursively on set."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d is None:
            d = {}
        d = dict(d, **kwargs)
        for k, v in d.items():
            self[k] = v

    @staticmethod
    def _convert(value):
        import collections.abc

        if isinstance(value, EasyDict):
            return value
        # handle any Mapping (incl. flax FrozenDict), not just dict
        if isinstance(value, collections.abc.Mapping):
            return EasyDict(dict(value))
        if isinstance(value, (list, tuple)):
            return type(value)(EasyDict._convert(v) for v in value)
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, EasyDict._convert(value))

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __delattr__(self, key):
        try:
            del self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def update(self, other=None, **kwargs):
        if other is None:
            other = {}
        for k, v in dict(other, **kwargs).items():
            self[k] = v

    def pop(self, key, *args):
        return super().pop(key, *args)


def log_config_to_file(cfg_dict, pre="cfg", logger=None):
    for key, val in cfg_dict.items():
        if isinstance(val, EasyDict):
            logger.info("----------- %s.%s -----------", pre, key)
            log_config_to_file(val, pre=f"{pre}.{key}", logger=logger)
            continue
        logger.info("%s.%s: %s", pre, key, val)


def merge_new_config(config, new_config):
    if "_BASE_CONFIG_" in new_config:
        with open(new_config["_BASE_CONFIG_"], "r") as f:
            yaml_config = yaml.safe_load(f)
        config.update(EasyDict(yaml_config))

    for key, val in new_config.items():
        if key == "_BASE_CONFIG_":
            continue
        if not isinstance(val, dict):
            config[key] = val
        else:
            if key not in config:
                config[key] = EasyDict()
            merge_new_config(config[key], val)

    return config


def cfg_from_yaml_file(cfg_file, config=None):
    if config is None:
        config = EasyDict()
    with open(cfg_file, "r") as f:
        new_config = yaml.safe_load(f)
    # resolve _BASE_CONFIG_ paths relative to the repo root or the cfg file
    if "_BASE_CONFIG_" in _flatten_keys(new_config):
        _resolve_base_paths(new_config, Path(cfg_file).resolve())
    merge_new_config(config=config, new_config=new_config)
    return config


def _flatten_keys(d):
    keys = set()
    stack = [d]
    while stack:
        cur = stack.pop()
        if isinstance(cur, dict):
            keys.update(cur.keys())
            stack.extend(v for v in cur.values() if isinstance(v, dict))
    return keys


def _resolve_base_paths(d, cfg_path: Path):
    """Make _BASE_CONFIG_ values absolute: try as-given (cwd-relative, the
    reference convention of running from tools/), then relative to the cfg
    file's ancestors."""
    if isinstance(d, dict):
        for k, v in list(d.items()):
            if k == "_BASE_CONFIG_" and isinstance(v, str):
                p = Path(v)
                if not p.exists():
                    for anc in cfg_path.parents:
                        cand = anc / v
                        if cand.exists():
                            d[k] = str(cand)
                            break
            elif isinstance(v, dict):
                _resolve_base_paths(v, cfg_path)


def cfg_from_list(cfg_list, config):
    """Set config keys via list (e.g., from command line) — ``KEY.SUBKEY value``
    pairs; values are literal-eval'd and type-checked against the existing
    entry (reference pcdet/config.py:16-48)."""
    assert len(cfg_list) % 2 == 0, "override list must be key/value pairs"
    for k, v in zip(cfg_list[0::2], cfg_list[1::2]):
        key_list = k.split(".")
        d = config
        for subkey in key_list[:-1]:
            assert subkey in d, f"NotFoundKey: {subkey}"
            d = d[subkey]
        subkey = key_list[-1]
        assert subkey in d, f"NotFoundKey: {subkey}"
        try:
            value = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            value = v
        if type(value) != type(d[subkey]) and d[subkey] is not None:  # noqa: E721
            if isinstance(d[subkey], EasyDict) and isinstance(value, dict):
                value = EasyDict(value)
            elif isinstance(value, (int, float)) and isinstance(d[subkey], (int, float)):
                pass
            else:
                raise TypeError(f"type {type(value)} does not match original type {type(d[subkey])}")
        d[subkey] = value
    return config


cfg = EasyDict()
cfg.LOCAL_RANK = 0


def as_easy(d):
    """Rehydrate a (possibly frozen/plain) mapping into an EasyDict.  Flax
    converts dict-typed Module attributes to FrozenDict, which loses
    attribute access — call this at module entry."""
    if isinstance(d, EasyDict):
        return d
    try:
        items = dict(d)
    except TypeError:
        return d
    return EasyDict(items)
