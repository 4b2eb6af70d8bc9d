"""bench.py artifact semantics: a probe failure with a FRESH same-round
capture must emit the capture as the primary payload (rc 0, value = last
FPS, stale_s age, probe failure demoted to a sub-object); rc=3/value=0.0
is reserved for rounds with no usable capture (VERDICT r4 next #5)."""

import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(tmp_path, snap):
    lg = tmp_path / "last_good.json"
    if snap is not None:
        lg.write_text(json.dumps(snap))
    env = dict(os.environ)
    env.update(
        BENCH_PROBE_BUDGET="6",       # force a fast probe failure
        BENCH_LAST_GOOD=str(lg),
        BENCH_DEADLINE="60",
        # the probe subprocess must not accidentally find a live backend
        JAX_PLATFORMS="nonexistent-backend",
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=120, env=env,
    )
    return r.returncode, json.loads(r.stdout.strip().splitlines()[-1])


def _fresh_snap(age_s=600.0, fps=49.69):
    cap = (datetime.datetime.now(datetime.timezone.utc)
           - datetime.timedelta(seconds=age_s))
    return {
        "metric": "waymo_partner_infer_fps", "value": fps,
        "unit": "frames/s", "vs_baseline": round(fps / 13.0, 3),
        "mfu": 0.2562, "train_step_ms": 91.2,
        "captured": cap.strftime("%Y-%m-%d %H:%MZ"),
    }


def test_fresh_capture_promoted_to_primary_payload(tmp_path):
    rc, payload = _run_bench(tmp_path, _fresh_snap())
    assert rc == 0
    assert payload["value"] == 49.69
    assert payload["metric"] == "waymo_partner_infer_fps"
    assert 0 < payload["stale_s"] < 7200
    assert payload["probe"]["error"] == "tpu_unavailable"
    assert "error" not in payload  # the TOP level is a success record


def test_stale_capture_falls_back_to_failure_envelope(tmp_path):
    rc, payload = _run_bench(tmp_path, _fresh_snap(age_s=3 * 86400))
    assert rc == 3
    assert payload["value"] == 0.0
    assert payload["error"] == "tpu_unavailable"
    assert payload["last_known_good"]["value"] == 49.69


def test_no_capture_is_a_failure_envelope(tmp_path):
    rc, payload = _run_bench(tmp_path, None)
    assert rc == 3
    assert payload["value"] == 0.0
    assert payload["error"] == "tpu_unavailable"
    assert "last_known_good" not in payload
