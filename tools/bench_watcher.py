#!/usr/bin/env python
"""One-shot bench watcher: poll the burn-probe ceiling and fire ONE
full `python bench.py` run in the first clean window (ceiling >=
PROBE_MIN), writing the JSON line to OUT.  The same
pollution-avoidance discipline as tools/scaling_watcher.py — a loaded
host produces out-of-band numbers for every entry (see BASELINE.md
bursty-window notes), so measuring there is wasted wall-clock."""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
from scaling_watcher import log, probe  # noqa: E402

PROBE_MIN = float(os.environ.get("BENCH_PROBE_MIN", "0.92"))
OUT = os.environ.get("BENCH_OUT", "/tmp/bench_clean.json")
MARKER = "/tmp/scaling_run_in_progress"
MAX_TRIES = int(os.environ.get("BENCH_MAX_TRIES", "40"))


def main() -> None:
    for i in range(MAX_TRIES):
        if os.path.exists(MARKER):
            log("bench_watcher: scaling run in progress, sleeping")
            time.sleep(300)
            continue
        c = probe()
        log(f"bench_watcher: probe {c:.3f} (need >= {PROBE_MIN})")
        if c >= PROBE_MIN:
            open(MARKER, "w").write("bench_watcher")
            failed = False
            try:
                t0 = time.time()
                try:
                    res = subprocess.run(
                        [sys.executable, "bench.py"],
                        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        capture_output=True,
                        text=True,
                        timeout=1800,
                    )
                except subprocess.TimeoutExpired:
                    log("bench_watcher: bench TIMED OUT after 1800 s; retrying")
                    failed = True
                    res = None
                if res is not None:
                    line = (
                        res.stdout.strip().splitlines()[-1]
                        if res.stdout.strip() else ""
                    )
                    if res.returncode != 0 or not line.startswith("{"):
                        log(
                            f"bench_watcher: bench FAILED rc={res.returncode}; "
                            f"stderr tail: {res.stderr[-400:]!r}"
                        )
                        failed = True
            finally:
                os.remove(MARKER)  # never hold the marker while sleeping
            if failed:
                time.sleep(240)
                continue
            with open(OUT, "w") as f:
                f.write(line + "\n")
            post = probe()
            log(
                f"bench_watcher: done in {time.time()-t0:.0f}s, post-probe "
                f"{post:.3f}; wrote {OUT}"
            )
            try:
                d = json.loads(line)
                log(f"bench_watcher: docs/s={d.get('docs_per_sec_synth')} "
                    f"p99={d.get('query_p99_ms')}ms pool={d.get('pool_qps')}qps")
            except Exception:
                pass
            return
        time.sleep(240)
    log("bench_watcher: no clean window found, giving up")


if __name__ == "__main__":
    main()
