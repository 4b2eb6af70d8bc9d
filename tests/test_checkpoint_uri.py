"""Checkpoint URI surface (modelzoo:// + URLs, reference
torchie/trainer/checkpoint.py:122-175) and curriculum seg-loss decay
(reference trainer.py:430-434)."""

import json
import os
import pickle

import numpy as np
import pytest


class TestCheckpointUri:
    def _payload(self):
        return {"step": 3, "params": {"w": np.ones((2, 2), np.float32)},
                "batch_stats": {}, "opt_state": {}}

    def test_file_url_loads_and_caches(self, tmp_path, monkeypatch):
        from partner_tpu.train.checkpoint import load_checkpoint

        monkeypatch.setenv("PARTNER_TPU_CACHE", str(tmp_path / "cache"))
        src = tmp_path / "state.pkl"
        src.write_bytes(pickle.dumps(self._payload()))
        url = "file://" + str(src)
        payload, meta = load_checkpoint(url)
        assert payload["step"] == 3
        np.testing.assert_array_equal(payload["params"]["w"], 1)
        # cached: deleting the source must not break a second load
        src.unlink()
        payload2, _ = load_checkpoint(url)
        assert payload2["step"] == 3

    def test_modelzoo_name_resolves_through_registry(self, tmp_path,
                                                     monkeypatch):
        from partner_tpu.train.checkpoint import load_checkpoint

        src = tmp_path / "zoo_ckpt.pkl"
        src.write_bytes(pickle.dumps(self._payload()))
        zoo = tmp_path / "model_zoo.json"
        zoo.write_text(json.dumps(
            {"partner_waymo_36e": "file://" + str(src)}))
        monkeypatch.setenv("PARTNER_TPU_MODEL_ZOO", str(zoo))
        monkeypatch.setenv("PARTNER_TPU_CACHE", str(tmp_path / "cache"))
        payload, _ = load_checkpoint("modelzoo://partner_waymo_36e")
        assert payload["step"] == 3

    def test_unknown_zoo_name_raises(self, tmp_path, monkeypatch):
        from partner_tpu.train.checkpoint import load_checkpoint

        monkeypatch.setenv("PARTNER_TPU_MODEL_ZOO",
                           str(tmp_path / "missing.json"))
        with pytest.raises(KeyError):
            load_checkpoint("modelzoo://nope")

    def test_local_dir_path_still_works(self, tmp_path):
        from partner_tpu.train.checkpoint import (load_checkpoint,
                                                  save_checkpoint)
        from partner_tpu.train.optim import build_one_cycle_optimizer
        from partner_tpu.train.train_state import create_train_state

        tx = build_one_cycle_optimizer(lr_max=1e-3, total_steps=10)
        state = create_train_state(
            {"params": {"w": np.zeros((2,), np.float32)}}, tx)
        path = save_checkpoint(str(tmp_path), state, meta={"epoch": 0})
        payload, meta = load_checkpoint(path)
        assert payload["step"] == 0 and meta["epoch"] == 0

    def test_latest_pointer_file_dereferences(self, tmp_path):
        """--checkpoint <wd>/latest must load the step dir the pointer
        names, not unpickle the pointer file itself (found by driving
        the dist_test CLI end-to-end)."""
        from partner_tpu.train.checkpoint import (load_checkpoint,
                                                  save_checkpoint)
        from partner_tpu.train.optim import build_one_cycle_optimizer
        from partner_tpu.train.train_state import create_train_state

        tx = build_one_cycle_optimizer(lr_max=1e-3, total_steps=10)
        state = create_train_state(
            {"params": {"w": np.zeros((2,), np.float32)}}, tx)
        save_checkpoint(str(tmp_path), state, meta={"epoch": 3})
        payload, meta = load_checkpoint(str(tmp_path / "latest"))
        assert payload["step"] == 0 and meta["epoch"] == 3


class TestCurriculumSegDecay:
    def test_decay_modes(self):
        import jax.numpy as jnp

        from partner_tpu.models.detectors import apply_seg_decay

        det, seg = jnp.float32(4.0), jnp.float32(2.0)
        # absent -> plain sum
        assert float(apply_seg_decay(det, seg, {})) == pytest.approx(6.0)
        # scalar curriculum weight
        out = apply_seg_decay(det, seg, {"seg_loss_decay": np.float32(0.5)})
        assert float(out) == pytest.approx(5.0)
        # negative -> dynamic balancing: seg contributes ~det
        out = apply_seg_decay(det, seg, {"seg_loss_decay": np.float32(-1)})
        assert float(out) == pytest.approx(8.0, rel=1e-4)

    def test_dynamic_balance_gradient_is_stopped(self):
        import jax
        import jax.numpy as jnp

        from partner_tpu.models.detectors import apply_seg_decay

        def f(seg):
            return apply_seg_decay(
                jnp.float32(4.0), seg, {"seg_loss_decay": np.float32(-1)})

        # total = det + seg * stop_grad(det/seg): d/dseg = det/seg only
        g = jax.grad(f)(jnp.float32(2.0))
        assert float(g) == pytest.approx(2.0, rel=1e-4)
