"""Decompose the transient-dense update: where do the nanoseconds go?

`dense_rowwise_adagrad` is the measured winner at flagship shapes
(tools/bench_update_variants.py); its cost is scatter-add-dominated
(~20 ns/slot at M=262k). This bench isolates the candidate levers:

- scatter-add alone (f32 buffer) — the baseline wall
- scatter-add into a bf16 buffer — halves random RMW bytes
- scatter-add with SORTED ids, with/without the `indices_are_sorted` hint —
  prepacked shards could sort each batch by the big table's ids for free at
  pack time (in-batch row order is training-invariant)
- the full-table masked-update passes alone (given g)
- dense_rowwise_adagrad end-to-end (reference point)

Same dedupe-proof methodology as bench_update_variants.py.
Run:  nohup python tools/bench_scatter_paths.py > /tmp/scatter_bench.log 2>&1 &
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
K = 64


def gen_ids_unsorted(m, n, step, seed):
    i = jnp.arange(m, dtype=jnp.uint32)
    h = (
        i * jnp.uint32(2654435761)
        + step.astype(jnp.uint32) * jnp.uint32(40503)
        + seed.astype(jnp.uint32) * jnp.uint32(2246822519)
    )
    h = h ^ (h >> 15)
    h = h * jnp.uint32(2654435761)
    h = h ^ (h >> 13)
    return (h % jnp.uint32(n)).astype(jnp.int32)


def gen_ids_sorted(m, n, step, seed):
    # Non-decreasing, ~uniform over [0, n): emulates a host-pre-sorted batch.
    # Small seed/step-dependent offset keeps payload-equivalents distinct.
    # f32 math avoids int32 overflow of i*n (f32 multiply by a positive
    # constant is monotone, so the sequence stays non-decreasing); a constant
    # per-step shift keeps payload-equivalents distinct without breaking order
    i = jnp.arange(m, dtype=jnp.float32)
    off = (step.astype(jnp.int32) * 131 + seed.astype(jnp.int32) * 7919) % 7
    base = (i * jnp.float32(n / m)).astype(jnp.int32)
    return jnp.minimum(base + off, n - 1)


def gen_grads(m, step):
    i = jnp.arange(m, dtype=jnp.float32)
    base = jnp.sin(i * 1e-3 + step.astype(jnp.float32))
    return base[:, None] * (0.01 + 1e-4 * jnp.arange(D, dtype=jnp.float32))[None, :]


def make_op(kind: str, n: int, m: int, k: int):
    """Each op chains a [N, D] f32 state through a K-step scan."""

    def scatter_add(state, step, seed, *, buf_dtype, sorted_ids, hint):
        ids = (gen_ids_sorted if sorted_ids else gen_ids_unsorted)(m, n, step, seed)
        g = gen_grads(m, step).astype(buf_dtype)
        buf = jnp.zeros((n, D), buf_dtype).at[ids].add(
            g, mode="drop", indices_are_sorted=hint
        )
        return state + 1e-6 * buf.astype(jnp.float32)

    def full_pass_update(state, step, seed):
        # the masked row-wise-Adagrad application given an aggregated g
        g = state * jnp.float32(1e-3) + (step + seed).astype(jnp.float32) * 1e-9
        touched = (jnp.arange(n) % 2) == (step % 2)
        g2 = jnp.mean(g * g, axis=1)
        denom = jnp.sqrt(g2 + 1.0) + 1e-10
        return jnp.where(touched[:, None], state - 0.01 * g / denom[:, None], state)

    def dense_e2e(state, step, seed):
        ids = gen_ids_unsorted(m, n, step, seed)
        g = gen_grads(m, step)
        acc = state[:, 0]
        t, a = opt_lib.dense_rowwise_adagrad(state, acc, ids, g, 0.01, 1e-10)
        return t.at[:, 0].set(a)

    ops = {
        "scatter_f32": partial(scatter_add, buf_dtype=jnp.float32, sorted_ids=False, hint=False),
        "scatter_bf16": partial(scatter_add, buf_dtype=jnp.bfloat16, sorted_ids=False, hint=False),
        "scatter_f32_sorted": partial(scatter_add, buf_dtype=jnp.float32, sorted_ids=True, hint=False),
        "scatter_f32_sorted_hint": partial(scatter_add, buf_dtype=jnp.float32, sorted_ids=True, hint=True),
        "scatter_bf16_sorted_hint": partial(scatter_add, buf_dtype=jnp.bfloat16, sorted_ids=True, hint=True),
        "full_pass_update": full_pass_update,
        "dense_e2e": dense_e2e,
    }
    op = ops[kind]

    @partial(jax.jit, donate_argnums=(0,))
    def run(state, seed):
        def body(carry, step):
            return op(carry, step, seed), ()

        state, _ = lax.scan(body, state, jnp.arange(k, dtype=jnp.int32))
        return state, state[0].sum().astype(jnp.float32)

    return run


def time_op(kind, n, m, k, reps=5, seed0=100):
    run = make_op(kind, n, m, k)
    state = jnp.zeros((n, D), jnp.float32) + 0.01
    state, v = run(state, jnp.int32(seed0))
    float(v)
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        state, v = run(state, jnp.int32(seed0 + 1 + r))
        float(v)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    n = 206_209
    kinds = [
        "scatter_f32", "scatter_bf16", "scatter_f32_sorted",
        "scatter_f32_sorted_hint", "scatter_bf16_sorted_hint",
        "full_pass_update", "dense_e2e",
    ]
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    out = []
    for m in (262_144, 65_536):
        for kind in kinds:
            t1 = time_op(kind, n, m, K, seed0=100)
            t2 = time_op(kind, n, m, 2 * K, seed0=9000)
            per_step = (t2 - t1) / K
            rec = {
                "op": kind, "n": n, "m": m,
                "per_step_ms": round(per_step * 1e3, 3),
                "ns_per_slot": round(per_step / m * 1e9, 2),
            }
            out.append(rec)
            print(json.dumps(rec), flush=True)
    print(json.dumps({"all": out}))


if __name__ == "__main__":
    main()
