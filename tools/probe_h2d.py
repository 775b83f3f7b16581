"""Characterize the tunnel's H2D path: rate vs size, data-dependence
(compression on the wire?), and whether concurrent puts pipeline.

Run:  nohup python tools/probe_h2d.py > /tmp/probe_h2d.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np


def force(xs):
    """Make sure transfers have landed: tiny computation + value fetch."""
    s = 0.0
    for x in xs:
        s += float(jnp.sum(x.reshape(-1)[:2]))
    return s


def timed_put(arrs, threads=1):
    t0 = time.perf_counter()
    if threads == 1:
        xs = [jax.device_put(a) for a in arrs]
    else:
        with ThreadPoolExecutor(max_workers=threads) as pool:
            xs = list(pool.map(jax.device_put, arrs))
    force(xs)
    return time.perf_counter() - t0


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)

    # warm
    timed_put([np.zeros((1 << 20,), np.int32)])

    out = []

    def run(label, arrs, threads=1, reps=3):
        ts = [timed_put(arrs, threads) for _ in range(reps)]
        t = sorted(ts)[len(ts) // 2]
        mb = sum(a.nbytes for a in arrs) / 1e6
        rec = {"case": label, "mb": round(mb, 1), "ms": round(t * 1e3, 1),
               "mb_per_s": round(mb / t, 1), "threads": threads}
        out.append(rec)
        print(json.dumps(rec), flush=True)

    # size scaling, random int32 in [0, 2^18) (ids-like entropy)
    for mb in (2, 8, 32):
        n = mb << 18
        a = rng.integers(0, 1 << 18, size=n, dtype=np.int32)
        run(f"random_ids_{mb}mb", [a])

    # data dependence at 32MB
    n = 32 << 18
    run("zeros_32mb", [np.zeros(n, np.int32)])
    run("arange_32mb", [np.arange(n, dtype=np.int32)])
    run("randbytes_32mb", [rng.integers(0, 2**31, size=n, dtype=np.int32)])

    # low-entropy ids: sorted user ids delta-like (small values)
    run("small_vals_32mb", [rng.integers(0, 4, size=n, dtype=np.int32)])

    # parallel puts: 4 x 8MB random, 1 vs 4 threads
    arrs = [rng.integers(0, 1 << 18, size=8 << 18, dtype=np.int32) for _ in range(4)]
    run("4x8mb_serialcall", arrs, threads=1)
    run("4x8mb_4threads", arrs, threads=4)

    # single put already async under the hood? time N sequential puts of
    # distinct arrays, forcing only at the end (lets the runtime pipeline)
    arrs2 = [rng.integers(0, 1 << 18, size=8 << 18, dtype=np.int32) for _ in range(4)]
    t0 = time.perf_counter()
    xs = [jax.device_put(a) for a in arrs2]
    force(xs)
    t = time.perf_counter() - t0
    rec = {"case": "4x8mb_pipelined_force_once", "mb": 33.6,
           "ms": round(t * 1e3, 1), "mb_per_s": round(33.6 / t, 1)}
    out.append(rec)
    print(json.dumps(rec), flush=True)

    print(json.dumps({"all": out}))


if __name__ == "__main__":
    main()
