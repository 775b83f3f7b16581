"""Watch the tunnel's H2D health; auto-run the full bench on recovery.

The axon tunnel has hours-long NEAR-DEAD episodes (CLAUDE.md). The full
wire-bound bench (hot-loop variants + from-disk) can only run on a healthy
wire, and recovery windows can be short — this watcher probes a tiny
payload every few minutes in a subprocess (so a hung probe can be abandoned
without wedging this process's jax client) and, when the rate clears
`--trigger` (default 300 MB/s, bench-grade), immediately launches
`python bench.py` (unless `--no-bench`) and exits.

Coordination: honors /tmp/tpu_busy.lock — while the lock file exists the
watcher idles without probing, so it never contends with a foreground
TPU run (probes share the single chip's tunnel).

Run:  nohup python tools/wire_watch.py > /tmp/wire_watch_r3.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

LOCK = "/tmp/tpu_busy.lock"
PROBE_SRC = r"""
import json, time, sys
import numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(int(time.time()) & 0x7fffffff)
a = rng.integers(0, 1 << 30, size=1 << 14, dtype=np.int32)  # 64KB
t0 = time.perf_counter()
x = jax.device_put(a)
_ = int(x[-1])
dt = time.perf_counter() - t0
mbps = a.nbytes / 1e6 / dt
if mbps > 20:  # escalate: confirm with 4MB before declaring healthy
    b = rng.integers(0, 1 << 30, size=1 << 20, dtype=np.int32)
    t0 = time.perf_counter()
    x = jax.device_put(b)
    _ = int(x[-1])
    dt = time.perf_counter() - t0
    mbps = b.nbytes / 1e6 / dt
print(json.dumps({"mb_per_s": round(mbps, 2)}))
"""


def probe(timeout_s: float = 900.0) -> float | None:
    """One H2D probe in a subprocess; None if it hung past timeout_s."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", PROBE_SRC], capture_output=True, text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)["mb_per_s"]
    return None


def main() -> None:
    trigger = 300.0
    if "--trigger" in sys.argv:
        trigger = float(sys.argv[sys.argv.index("--trigger") + 1])
    run_bench = "--no-bench" not in sys.argv
    interval = 300.0
    if "--interval" in sys.argv:
        interval = float(sys.argv[sys.argv.index("--interval") + 1])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    while True:
        if os.path.exists(LOCK):
            print(f"{time.strftime('%H:%M:%S')} tpu busy ({LOCK}); skipping probe",
                  flush=True)
            time.sleep(interval)
            continue
        rate = probe()
        print(f"{time.strftime('%H:%M:%S')} probe: "
              f"{'hung' if rate is None else f'{rate} MB/s'}", flush=True)
        if rate is not None and rate >= trigger:
            print(f"{time.strftime('%H:%M:%S')} wire recovered "
                  f"({rate} >= {trigger} MB/s)", flush=True)
            if run_bench:
                with open(LOCK, "w") as f:
                    f.write("wire_watch bench run\n")
                try:
                    print("launching full bench…", flush=True)
                    out = subprocess.run(
                        [sys.executable, os.path.join(repo, "bench.py")],
                        cwd=repo, capture_output=True, text=True,
                    )
                    sys.stderr.write(out.stderr[-4000:])
                    print(out.stdout, flush=True)
                finally:
                    os.unlink(LOCK)
            return
        time.sleep(interval)


if __name__ == "__main__":
    main()
