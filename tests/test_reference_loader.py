"""The reference_loader's sys.modules stubs must never shadow REAL
installed modules: the stubs outlive the reference exec (they stay in
sys.modules for the whole pytest process), so shadowing e.g. matplotlib
breaks any later in-process import by unrelated tests/tools — the demo
CLI's ``matplotlib.use("Agg")`` died on a leaked attribute-less stub
when test_torch_parity ran first (round-5 ordering regression)."""

import importlib.util
import sys

import reference_loader


def test_stubs_do_not_shadow_installed_modules():
    reference_loader._install_stubs()
    for name in ("matplotlib", "tqdm"):
        if importlib.util.find_spec(name) is None:
            continue  # not installed in this env; stubbing it is fine
        mod = sys.modules.get(name)
        assert mod is None or getattr(mod, "__file__", None), (
            f"{name} is shadowed by an attribute-less stub"
        )
    # the canary that actually broke: matplotlib.use must be reachable
    import matplotlib

    assert hasattr(matplotlib, "use")


def test_stubs_still_cover_missing_reference_deps():
    reference_loader._install_stubs()
    # genuinely-absent deps must be stubbed so the reference tree execs
    for name in ("numba", "addict", "terminaltables"):
        if importlib.util.find_spec(name) is not None:
            continue
        assert name in sys.modules, f"missing stub for absent dep {name}"
