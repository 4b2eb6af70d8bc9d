"""Reference-config compatibility sweep (SURVEY 5.6 contract).

Loads the REFERENCE'S OWN config files (/root/reference/configs/**) through
our Config.fromfile and builds the detector through our registries, with no
edits. This is the de-facto public API: a reference user's configs must work
as-is (modulo data paths, which only matter at dataset build).
"""

import glob
import os

import pytest

from partner_tpu.models import build_detector
from partner_tpu.train.config import Config

REF_CFG_DIR = "/root/reference/configs"

# configs whose MODEL the rebuild intentionally does not provide 1:1
# (none currently — keep the mechanism for future exclusions)
SKIP = {}


def _ref_configs():
    if not os.path.isdir(REF_CFG_DIR):
        return []
    out = []
    for path in sorted(glob.glob(os.path.join(REF_CFG_DIR, "**", "*.py"),
                                 recursive=True)):
        rel = os.path.relpath(path, REF_CFG_DIR)
        out.append(pytest.param(path, id=rel,
                                marks=([pytest.mark.xfail(reason=SKIP[rel])]
                                       if rel in SKIP else [])))
    return out


def test_det3d_shim_does_not_persist():
    """Config.fromfile's det3d shim must be scoped to the config exec.

    A persistent shim shadows the REAL reference det3d package that
    tests/reference_loader.py imports from /root/reference, breaking
    every executed-reference golden-parity test that runs after any
    config load (observed: 27 suite-level failures)."""
    import sys

    cfgs = _ref_configs()
    if not cfgs:
        pytest.skip("reference tree unavailable")
    had_real = "det3d" in sys.modules and hasattr(
        sys.modules["det3d"], "__path__")
    Config.fromfile(cfgs[0].values[0])
    if not had_real:
        assert "det3d" not in sys.modules or hasattr(
            sys.modules["det3d"], "__path__"
        ), "fromfile left a det3d shim in sys.modules"
    # the real reference package must be importable afterwards
    from tests.reference_loader import load_reference_center_coder

    assert load_reference_center_coder() is not None


@pytest.mark.parametrize("path", _ref_configs())
def test_reference_config_loads_and_builds(path):
    cfg = Config.fromfile(path)
    assert "model" in cfg, "config defines no model"
    det = build_detector(cfg.model, cfg.get("train_cfg"),
                         cfg.get("test_cfg"),
                         voxel_generator=cfg.get("voxel_generator"))
    assert det is not None
    # the data pipeline stages the config names must all exist in the
    # registry (they are instantiated lazily by Compose)
    import partner_tpu.data.pipeline  # noqa: F401  registers stages
    from partner_tpu.data.registry import PIPELINES

    for key in ("train_pipeline", "test_pipeline"):
        for stage in cfg.get(key, []):
            t = dict(stage)["type"]
            assert t in PIPELINES._module_dict, f"{key} stage {t} missing"
