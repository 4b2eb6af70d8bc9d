"""Component registries + build_from_cfg, mirroring det3d's public API.

Reference: /root/reference/det3d/utils/registry.py:6-78 and
det3d/models/registry.py:1-11. Configs instantiate components from
``dict(type="Name", ...)`` so reference configs port with minimal edits.
"""

import inspect


class Registry:
    def __init__(self, name):
        self.name = name
        self._module_dict = {}

    def __repr__(self):
        return f"Registry(name={self.name}, items={list(self._module_dict)})"

    @property
    def module_dict(self):
        return self._module_dict

    def get(self, key):
        return self._module_dict.get(key)

    def register_module(self, cls=None, *, name=None):
        def _register(c):
            key = name or c.__name__
            if key in self._module_dict:
                raise KeyError(f"{key} already registered in {self.name}")
            self._module_dict[key] = c
            return c

        if cls is None:
            return _register
        return _register(cls)


def build_from_cfg(cfg, registry, default_args=None):
    """Instantiate registry[cfg['type']](**cfg-without-type, **default_args)."""
    if not isinstance(cfg, dict) or "type" not in cfg:
        raise TypeError(f"cfg must be a dict with 'type', got {cfg!r}")
    args = dict(cfg)
    obj_type = args.pop("type")
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(f"{obj_type} is not in the {registry.name} registry")
    elif inspect.isclass(obj_type):
        obj_cls = obj_type
    else:
        raise TypeError(f"type must be str or class, got {obj_type!r}")
    if default_args is not None:
        for k, v in default_args.items():
            args.setdefault(k, v)
    # tolerate extra kwargs the TPU port does not need (reference modules
    # accept and drop unused ctor args via **kwargs)
    sig = inspect.signature(obj_cls.__init__ if inspect.isclass(obj_cls) else obj_cls)
    has_var_kw = any(
        p.kind == inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values()
    )
    if not has_var_kw:
        allowed = set(sig.parameters) - {"self"}
        args = {k: v for k, v in args.items() if k in allowed}
    return obj_cls(**args)


READERS = Registry("reader")
BACKBONES = Registry("backbone")
NECKS = Registry("neck")
BBOX_HEADS = Registry("bbox_head")
SEG_HEADS = Registry("seg_head")
DETECTORS = Registry("detector")
LOSSES = Registry("loss")
