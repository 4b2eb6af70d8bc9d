"""train CLI with mid-training validation (VERDICT r1 missing #4).

Drives tools/train.py --validate on the tiny synthetic config: two epochs
of the E2E flagship-style model, each followed by a val-set evaluation
through the shared evaluator (the reference Trainer.val workflow,
torchie/trainer/trainer.py:503-582). Asserts the val metrics are logged
per interval and the checkpoint/resume files appear.
"""

import glob
import os
import pickle
import shutil
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

CFG = os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "tests", "tiny_synthetic.py"))


@pytest.mark.slow
def test_train_with_validation(rng, tmp_path, monkeypatch, caplog):
    import logging

    caplog.set_level(logging.INFO, logger="partner_tpu")
    import create_data
    from test_create_data import _write_waymo_fixture

    root = str(tmp_path / "data")
    _write_waymo_fixture(root, rng, n_frames=3)
    info_path = create_data.waymo_data_prep(root, "train", nsweeps=1)
    shutil.copy(info_path, os.path.join(root, "infos_train.pkl"))
    shutil.copy(info_path, os.path.join(root, "infos_val.pkl"))
    monkeypatch.setenv("TINY_DATA_ROOT", root)

    work_dir = str(tmp_path / "work")
    import importlib

    import train

    importlib.reload(train)
    monkeypatch.setattr(sys, "argv", [
        "train.py", CFG, "--work_dir", work_dir, "--batch_size", "2",
        "--total_steps", "4", "--max_steps_per_epoch", "2",
        "--validate", "--eval_interval", "1", "--eval_max_frames", "2",
        "--max_points", "4096",
    ])
    train.main()

    # checkpoints for both epochs + latest pointer
    ckpts = sorted(os.listdir(work_dir))
    assert any(c.startswith("ckpt_") for c in ckpts), ckpts
    assert "latest" in ckpts

    # validation ran each epoch: prediction.pkl + val metrics in the log
    assert os.path.exists(os.path.join(work_dir, "prediction.pkl"))
    text = caplog.text
    assert text.count("[val] epoch") >= 2, text[-2000:]
    assert "mAPH/L2" in text

    # PaviLoggerHook-compat metrics sink wrote per-step JSONL records
    import json
    sink = os.path.join(work_dir, "metrics.jsonl")
    assert os.path.exists(sink)
    recs = [json.loads(l) for l in open(sink)]
    assert recs and all("loss" in r and "step" in r for r in recs)
