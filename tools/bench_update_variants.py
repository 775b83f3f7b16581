"""Microbenchmark: fused sparse-update variants on the real TPU chip.

Compares the three oracle-identical row-wise Adagrad implementations
(`train/optimizer.py`) at flagship shapes to pick `pick_sparse_update`'s
policy from measurement, not guesswork:

- sparse  : sort + segment-aggregate + gather/update/scatter touched rows
- dense   : transient [N, D] scatter-add + full-table masked update
- hybrid  : transient [N, D] scatter-add + touched-row gather/update/scatter

Methodology (DESIGN §5b — the axon tunnel dedupes byte-identical dispatches
and `block_until_ready` is unreliable for small results):
- ids/grads are GENERATED ON DEVICE inside a K-step `lax.scan` from a scalar
  seed argument; every dispatch carries a distinct seed, so payloads are
  byte-distinct for the whole run.
- timing is a value fetch (`float(...)`) per dispatch; per-step time comes
  from the (2K - K) difference of two scan lengths, cancelling dispatch/RTT
  overhead.
- table/accumulator state is donated and chained across dispatches.

Run:  nohup python tools/bench_update_variants.py > /tmp/upd_bench.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from two_tower_recommender_model_tpu.train import optimizer as opt_lib

D = 128
LR, EPS = 0.01, 1e-10
K = 64  # base scan length; also measured at 2K


def make_runner(upd, n: int, m: int, k: int):
    def gen(step, seed):
        i = jnp.arange(m, dtype=jnp.uint32)
        h = (
            i * jnp.uint32(2654435761)
            + step.astype(jnp.uint32) * jnp.uint32(40503)
            + seed.astype(jnp.uint32) * jnp.uint32(2246822519)
        )
        h = h ^ (h >> 15)
        h = h * jnp.uint32(2654435761)
        h = h ^ (h >> 13)
        ids = (h % jnp.uint32(n)).astype(jnp.int32)
        base = jnp.sin(i.astype(jnp.float32) * 1e-3 + step.astype(jnp.float32))
        g = base[:, None] * (0.01 + 1e-4 * jnp.arange(D, dtype=jnp.float32))[None, :]
        return ids, g

    @partial(jax.jit, donate_argnums=(0, 1), static_argnums=())
    def run(table, acc, seed):
        def body(carry, step):
            t, a = carry
            ids, g = gen(step, seed)
            t, a = upd(t, a, ids, g, LR, EPS)
            return (t, a), ()

        (t, a), _ = lax.scan(body, (table, acc), jnp.arange(k, dtype=jnp.int32))
        probe = (t[0].sum() + a[:8].sum()).astype(jnp.float32)
        return t, a, probe

    return run


def time_dispatches(run, n: int, reps: int, seed0: int) -> float:
    table = jnp.zeros((n, D), jnp.float32) + 0.01
    acc = jnp.zeros((n,), jnp.float32)
    table, acc, v = run(table, acc, jnp.int32(seed0))  # compile + warm
    float(v)
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        table, acc, v = run(table, acc, jnp.int32(seed0 + 1 + r))
        float(v)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    variants = {
        "sparse": opt_lib.sparse_rowwise_adagrad,
        "dense": opt_lib.dense_rowwise_adagrad,
        "hybrid": opt_lib.hybrid_rowwise_adagrad,
    }
    shapes = [
        (206_209, 65_536),
        (206_209, 262_144),
        (49_688, 262_144),
        (49_688, 65_536),
    ]
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    results = []
    for n, m in shapes:
        for name, upd in variants.items():
            t1 = time_dispatches(make_runner(upd, n, m, K), n, reps=5, seed0=1000)
            t2 = time_dispatches(make_runner(upd, n, m, 2 * K), n, reps=5, seed0=9000)
            per_step = (t2 - t1) / K
            rec = {
                "variant": name,
                "n_rows": n,
                "batch_slots": m,
                "per_step_ms": round(per_step * 1e3, 3),
                "ns_per_slot": round(per_step / m * 1e9, 2),
                "t_k_ms": round(t1 * 1e3, 1),
                "t_2k_ms": round(t2 * 1e3, 1),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
