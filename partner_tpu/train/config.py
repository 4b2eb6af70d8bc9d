"""Python-module config system (Config.fromfile), det3d-compatible.

Mirrors /root/reference/det3d/torchie/utils/config.py:12-112: a config is an
executable python module whose non-dunder globals become the config dict,
with attribute-style access. Config text is preserved for checkpoint
embedding (tools/train.py:131-136).
"""

import importlib.util
import os
import sys


class ConfigDict(dict):
    """dict with attribute access, recursively wrapping nested dicts."""

    def __getattr__(self, name):
        try:
            v = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        if isinstance(v, dict) and not isinstance(v, ConfigDict):
            v = ConfigDict(v)
            self[name] = v
        return v

    def __setattr__(self, name, value):
        self[name] = value

    def get(self, key, default=None):
        v = super().get(key, default)
        if isinstance(v, dict) and not isinstance(v, ConfigDict):
            v = ConfigDict(v)
            self[key] = v
        return v


def _wrap(value):
    if isinstance(value, dict):
        return ConfigDict({k: _wrap(v) for k, v in value.items()})
    if isinstance(value, (list, tuple)):
        return type(value)(_wrap(v) for v in value)
    return value


def _install_det3d_shim():
    """Make the REFERENCE's own config files loadable unedited.

    The only det3d import across the reference configs tree is
    ``from det3d.utils.config_tool import get_downsample_factor``
    (/root/reference/det3d/utils/config_tool.py:39-53); synthesize that
    module when no real det3d is installed, so SURVEY 5.6's "reference
    configs port with minimal edits" holds for zero edits.

    Returns the list of sys.modules names installed, so fromfile can pop
    them after the config executes: a PERSISTENT shim would shadow the
    real reference det3d package that tests/reference_loader.py imports
    from /root/reference for golden-parity execution (a suite-level
    interaction that broke 27 parity tests when any config loaded
    first)."""
    if "det3d.utils.config_tool" in sys.modules:
        return []
    try:
        import det3d.utils.config_tool  # noqa: F401  (real install wins)
        return []
    except ImportError:
        pass
    import types

    import numpy as np

    def get_downsample_factor(model_config):
        try:
            neck_cfg = model_config["neck"]
        except (KeyError, TypeError):
            model_config = model_config["first_stage_cfg"]
            neck_cfg = model_config["neck"]
        factor = np.prod(neck_cfg.get("ds_layer_strides", [1]))
        if len(neck_cfg.get("us_layer_strides", [])) > 0:
            factor /= neck_cfg.get("us_layer_strides", [])[-1]
        factor *= model_config["backbone"]["ds_factor"]
        factor = int(factor)
        assert factor > 0
        return factor

    pkg = types.ModuleType("det3d")
    utils = types.ModuleType("det3d.utils")
    tool = types.ModuleType("det3d.utils.config_tool")
    tool.get_downsample_factor = get_downsample_factor
    utils.config_tool = tool
    pkg.utils = utils
    installed = []
    for name, mod in (("det3d", pkg), ("det3d.utils", utils),
                      ("det3d.utils.config_tool", tool)):
        if name not in sys.modules:
            sys.modules[name] = mod
            installed.append(name)
    return installed


class Config:
    def __init__(self, cfg_dict, filename=None, text=""):
        self._cfg_dict = ConfigDict({k: _wrap(v) for k, v in cfg_dict.items()})
        self.filename = filename
        self.text = text

    @staticmethod
    def fromfile(filename):
        filename = os.path.abspath(os.path.expanduser(filename))
        if not os.path.isfile(filename):
            raise FileNotFoundError(filename)
        if not filename.endswith(".py"):
            raise ValueError("config must be a .py file")
        shim_names = _install_det3d_shim()
        module_name = "_partner_cfg_" + os.path.splitext(
            os.path.basename(filename)
        )[0]
        spec = importlib.util.spec_from_file_location(module_name, filename)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[module_name] = mod
        try:
            spec.loader.exec_module(mod)
            cfg_dict = {
                k: v for k, v in mod.__dict__.items()
                if not k.startswith("__") and not callable(v)
                and not isinstance(v, type(sys))
            }
        finally:
            sys.modules.pop(module_name, None)
            for name in shim_names:
                sys.modules.pop(name, None)
        with open(filename) as f:
            text = f.read()
        return Config(cfg_dict, filename=filename, text=text)

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            return getattr(self._cfg_dict, name)
        except AttributeError:
            raise AttributeError(f"config has no attribute {name!r}")

    def __getitem__(self, name):
        return self._cfg_dict[name]

    def __contains__(self, name):
        return name in self._cfg_dict

    def get(self, name, default=None):
        return self._cfg_dict.get(name, default)

    def keys(self):
        return self._cfg_dict.keys()
