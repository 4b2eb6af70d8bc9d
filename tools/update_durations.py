"""Regenerate tests/durations.json from a `pytest --durations=0` log.

Usage:  python -m pytest tests/ -q --durations=0 > /tmp/full.log
        python tools/update_durations.py /tmp/full.log

The manifest drives the tiered suite (tests/conftest.py auto-marks tests
above PARTNER_SLOW_THRESHOLD seconds as ``slow``); regenerate it once per
round so new tests get classified.
"""

import collections
import json
import os
import re
import sys


def main(log_path):
    dur = collections.defaultdict(float)
    with open(log_path) as f:
        for line in f:
            m = re.match(r"([0-9.]+)s (call|setup|teardown)\s+(\S+)", line)
            if m:
                dur[m.group(3)] += float(m.group(1))
    if not dur:
        raise SystemExit("no duration lines found — run pytest with "
                         "--durations=0")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "tests", "durations.json")
    with open(out, "w") as f:
        json.dump({k: round(v, 2) for k, v in sorted(dur.items())}, f,
                  indent=0)
    print(f"wrote {len(dur)} entries to {out}")


if __name__ == "__main__":
    main(sys.argv[1])
