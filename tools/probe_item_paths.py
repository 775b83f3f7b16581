"""Probe: can the UNSORTED item table get the sorted fast paths?

DESIGN §8's residual: at bs=262k the default step is dominated by the item
table (t_product_id, N=49,688) — its gather (~2.8 ms) and scatter-update
(~3.8 ms) run per-row random access because only ONE feature (the user slot)
rides the host sort. Candidate fixes measured here, all at flagship shapes
(N=49,688, D=128, M=262,144):

- xla_gather_unsorted / xla_gather_sorted : the gather cost and what mere
  monotonicity buys inside XLA
- pallas_gather_sorted                    : block-sorted one-hot MXU gather
- update_dense_unsorted                   : today's transient-dense Adagrad
- update_fused_sorted                     : fused block-sorted Adagrad
- perm_gather_d64 / d128                  : the realign cost a dual-sorted
  layout pays to re-pair towers (random row gather of [M, d])
- lax_sort_m                              : device-side (id, row) sort — the
  no-wire-change alternative to host dual-sorting

Verdict math: dual-sort wins if
  (gather_sorted + update_sorted + realigns) < (gather_unsorted + update_unsorted).

Same dedupe-proof methodology as tools/bench_update_variants.py: device-
generated payloads keyed on (step, seed), (2K-K)-dispatch difference, value
fetch per dispatch, donated chained state.

Run:  nohup python tools/probe_item_paths.py > /tmp/item_paths.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

N, D, M = 49_688, 128, 262_144
K = 32


def _hash(step, seed, m):
    i = jnp.arange(m, dtype=jnp.uint32)
    h = (
        i * jnp.uint32(2654435761)
        + step.astype(jnp.uint32) * jnp.uint32(40503)
        + seed.astype(jnp.uint32) * jnp.uint32(2246822519)
    )
    h = h ^ (h >> 15)
    h = h * jnp.uint32(2654435761)
    return h ^ (h >> 13)


def _ids_unsorted(step, seed):
    return (_hash(step, seed, M) % jnp.uint32(N)).astype(jnp.int32)


def _ids_sorted(step, seed):
    # monotone ids with realistic coverage: cumsum of 0/1 deltas with mean
    # ~N/M, clipped to the table
    bump = (_hash(step, seed, M) % jnp.uint32(1024) < jnp.uint32(194)).astype(jnp.int32)
    return jnp.minimum(jnp.cumsum(bump), N - 1)


def _grads(step, m):
    base = jnp.sin(jnp.arange(m, dtype=jnp.float32) * 1e-3 + step.astype(jnp.float32))
    return base[:, None] * (0.01 + 1e-4 * jnp.arange(D, dtype=jnp.float32))[None, :]


def make_case(name: str, k: int):
    """Returns run(state..., seed) -> (state..., probe) for the named case."""
    from two_tower_recommender_model_tpu.ops.block_sorted import (
        block_sorted_lookup, block_sorted_rowwise_adagrad_fused,
    )
    from two_tower_recommender_model_tpu.train import optimizer as opt_lib

    w = jnp.ones((D, 8), jnp.float32) * 1e-3

    if name in ("xla_gather_unsorted", "xla_gather_sorted", "pallas_gather_sorted"):
        gen = _ids_sorted if "sorted" in name else _ids_unsorted

        def step_fn(table, step, seed):
            ids = gen(step, seed)
            if name == "pallas_gather_sorted":
                out = block_sorted_lookup(table, ids)
            else:
                out = table[ids]
            return table, (out @ w).sum()

    elif name in ("update_dense_unsorted", "update_fused_sorted"):
        gen = _ids_sorted if "sorted" in name else _ids_unsorted

        def step_fn(state, step, seed):
            table, acc = state
            ids = gen(step, seed)
            g = _grads(step, M)
            if name == "update_fused_sorted":
                table, acc = block_sorted_rowwise_adagrad_fused(
                    table, acc, ids, g, 0.01)
            else:
                table, acc = opt_lib.dense_rowwise_adagrad(
                    table, acc, ids, g, 0.01, 1e-10)
            return (table, acc), table[0].sum() + acc[:8].sum()

    elif name.startswith("perm_gather_d"):
        d = int(name.removeprefix("perm_gather_d"))
        wd = jnp.ones((d, 8), jnp.float32) * 1e-3

        def step_fn(x, step, seed):
            pidx = (_hash(step, seed, M) % jnp.uint32(M)).astype(jnp.int32)
            y = x[pidx]
            return x, (y @ wd).sum()

    elif name == "lax_sort_m":

        def step_fn(state, step, seed):
            keys = _ids_unsorted(step, seed)
            vals = jnp.arange(M, dtype=jnp.int32)
            sk, sv = lax.sort((keys, vals), num_keys=1)
            return state, (sk[:: 4096].sum() + sv[:: 4096].sum()).astype(jnp.float32)

    else:
        raise ValueError(name)

    @partial(jax.jit, donate_argnums=(0,))
    def run(state, seed):
        def body(carry, step):
            state, s = carry
            state, p = step_fn(state, step, seed)
            return (state, s + p), ()

        (state, s), _ = lax.scan(
            body, (state, jnp.float32(0)), jnp.arange(k, dtype=jnp.int32))
        return state, s

    return run


def init_state(name: str):
    if name in ("update_dense_unsorted", "update_fused_sorted"):
        return (jnp.zeros((N, D), jnp.float32) + 0.01, jnp.zeros((N,), jnp.float32))
    if name.startswith("perm_gather_d"):
        d = int(name.removeprefix("perm_gather_d"))
        return jnp.ones((M, d), jnp.float32) * 0.01
    if name == "lax_sort_m":
        return jnp.float32(0)
    return jnp.ones((N, D), jnp.float32) * 0.01  # gather cases


def time_case(name: str, k: int, reps: int, seed0: int) -> float:
    # fold the case into the seed so no two cases ever dispatch byte-identical
    # payloads (the tunnel dedupes on payload bytes — CLAUDE.md)
    import zlib

    seed0 = seed0 + (zlib.crc32(name.encode()) % 100_000) * 16
    run = make_case(name, k)
    state = init_state(name)
    state, v = run(state, jnp.int32(seed0))
    float(v)  # compile + warm, value fetch
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        state, v = run(state, jnp.int32(seed0 + 1 + r))
        float(v)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    cases = [
        "xla_gather_unsorted",
        "xla_gather_sorted",
        "pallas_gather_sorted",
        "update_dense_unsorted",
        "update_fused_sorted",
        "perm_gather_d64",
        "perm_gather_d128",
        "lax_sort_m",
    ]
    results = []
    for name in cases:
        t1 = time_case(name, K, reps=5, seed0=1000)
        t2 = time_case(name, 2 * K, reps=5, seed0=9000)
        per_step = (t2 - t1) / K
        rec = {
            "case": name,
            "per_step_ms": round(per_step * 1e3, 3),
            "ns_per_slot": round(per_step / M * 1e9, 2),
            "t_k_ms": round(t1 * 1e3, 1),
            "t_2k_ms": round(t2 * 1e3, 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
