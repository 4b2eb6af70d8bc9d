"""On-chip perf capture: run bench.py across the A/B matrix and collect
one JSON per variant.

Usage: python tools/capture_perf.py [outdir]   (default /tmp/perf_r3)

Round-3 matrix (2026-08-19, post A/B flips — defaults are now fused
heads OFF + pallas OFF, the measured winner at 50.08 FPS):
  baseline      — current defaults
  fuse          — PARTNER_TPU_FUSED_HEAD=1 (the measured-loss knob)
  pallas_stem   — only the fused stem kernel on (attribution)
  pallas_attn   — only the fused vote-Swin attention kernel on

Each run also reports train_step_ms and fps_batch2 (in-bench). The
summary table prints at the end; feed the winners into PERF.md and flip
defaults accordingly.
"""

import json
import os
import subprocess
import sys

VARIANTS = [
    ("baseline", {}),
    ("fuse", {"PARTNER_TPU_FUSED_HEAD": "1"}),
    ("pallas_stem", {"PARTNER_TPU_PALLAS_STEM": "1"}),
    ("pallas_attn", {"PARTNER_TPU_PALLAS_ATTN": "1"}),
    ("static_rpe", {"PARTNER_TPU_STATIC_RPE": "1"}),
]


def main(outdir="/tmp/perf_r3"):
    os.makedirs(outdir, exist_ok=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    for name, env_extra in VARIANTS:
        env = dict(os.environ)
        env.update(env_extra)
        # train step only once (slow compile); batch2 every time (cheap)
        env["BENCH_TRAIN"] = "1" if name == "baseline" else "0"
        # bench's internal deadline must fire BEFORE our subprocess
        # timeout so a wedged variant still emits structured JSON and
        # the remaining variants run
        env.setdefault("BENCH_DEADLINE", "1650")
        out_path = os.path.join(outdir, f"bench_{name}.json")
        print(f"=== {name} {env_extra} ===", flush=True)
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(repo, "bench.py")],
                env=env, capture_output=True, text=True, timeout=1800)
            line = (r.stdout.strip().splitlines() or ["{}"])[-1]
            rc = r.returncode
            if rc != 0:
                print(r.stderr[-2000:], file=sys.stderr)
        except subprocess.TimeoutExpired:
            line, rc = "", -1
        print(line, flush=True)
        try:
            results[name] = json.loads(line)
        except json.JSONDecodeError:
            results[name] = {"error": "capture_timeout" if rc == -1
                             else "unparseable", "rc": rc}
        with open(out_path, "w") as f:
            json.dump(results[name], f)
    print("\n=== summary ===")
    for name, res in results.items():
        print(f"{name:14s} fps={res.get('value')} mfu={res.get('mfu')} "
              f"batch2={res.get('fps_batch2')} "
              f"train_ms={res.get('train_step_ms')} "
              f"err={res.get('error')}")
    with open(os.path.join(outdir, "summary.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main(*sys.argv[1:])
