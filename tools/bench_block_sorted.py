"""Block-sorted one-hot MXU kernels vs the XLA gather/scatter paths, on chip.

Flagship shapes (N=206209, D=128, sorted ids), dedupe-proof methodology from
bench_scatter_paths.py: K-step scan with step/seed-varied payloads, per-step
time = (T(2K) - T(K)) / K with a value fetch awaiting completion.

Also asserts numeric correctness of each kernel against its XLA oracle on the
first batch (exact for lookup/f32; tolerance for bf16 variants).

Run:  nohup python tools/bench_block_sorted.py > /tmp/block_sorted_bench.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from two_tower_recommender_model_tpu.ops.block_sorted import (
    block_sorted_lookup,
    block_sorted_rowwise_adagrad,
    block_sorted_rowwise_adagrad_fused,
)
from two_tower_recommender_model_tpu.train import optimizer as opt_lib

N = 206_209
D = 128
K = 32


def gen_ids_sorted(m, n, step, seed):
    i = jnp.arange(m, dtype=jnp.float32)
    off = (step.astype(jnp.int32) * 131 + seed.astype(jnp.int32) * 7919) % 7
    base = (i * jnp.float32(n / m)).astype(jnp.int32)
    return jnp.minimum(base + off, n - 1)


def gen_grads(m, step):
    i = jnp.arange(m, dtype=jnp.float32)
    base = jnp.sin(i * 1e-3 + step.astype(jnp.float32))
    return base[:, None] * (0.01 + 1e-4 * jnp.arange(D, dtype=jnp.float32))[None, :]


def make_op(kind: str, m: int, k: int, r: int, c: int):
    def xla_gather(state, step, seed):
        ids = gen_ids_sorted(m, N, step, seed)
        rows = jnp.take(state, ids, axis=0)
        return state + 1e-9 * rows.sum(0)[None, :]

    def kernel_gather(state, step, seed, *, mmdt):
        ids = gen_ids_sorted(m, N, step, seed)
        rows = block_sorted_lookup(state, ids, r=r, c=c, matmul_dtype=mmdt)
        return state + 1e-9 * rows.sum(0)[None, :]

    def xla_update(state, step, seed):
        ids = gen_ids_sorted(m, N, step, seed)
        g = gen_grads(m, step)
        acc = jnp.abs(state[:, 0]) + 1e-3
        t, a = opt_lib.dense_rowwise_adagrad(
            state, acc, ids, g, 0.01, 1e-10, ids_sorted=True
        )
        return t.at[:, 0].set(a * 1e-3)

    def kernel_update(state, step, seed, *, mmdt):
        ids = gen_ids_sorted(m, N, step, seed)
        g = gen_grads(m, step)
        acc = jnp.abs(state[:, 0]) + 1e-3
        t, a = block_sorted_rowwise_adagrad(
            state, acc, ids, g, 0.01, 1e-10, r=r, c=c, matmul_dtype=mmdt
        )
        return t.at[:, 0].set(a * 1e-3)

    def kernel_update_fused(state, step, seed, *, mmdt):
        ids = gen_ids_sorted(m, N, step, seed)
        g = gen_grads(m, step)
        acc = jnp.abs(state[:, 0]) + 1e-3
        t, a = block_sorted_rowwise_adagrad_fused(
            state, acc, ids, g, 0.01, 1e-10, r=r, c=c, matmul_dtype=mmdt
        )
        return t.at[:, 0].set(a * 1e-3)

    ops = {
        "xla_gather": xla_gather,
        "kernel_gather_f32": partial(kernel_gather, mmdt="float32"),
        "kernel_gather_bf16": partial(kernel_gather, mmdt="bfloat16"),
        "xla_update_sorted_hint": xla_update,
        "kernel_update_f32": partial(kernel_update, mmdt="float32"),
        "kernel_update_fused_f32": partial(kernel_update_fused, mmdt="float32"),
        "kernel_update_fused_bf16": partial(kernel_update_fused, mmdt="bfloat16"),
        "kernel_update_bf16": partial(kernel_update, mmdt="bfloat16"),
    }
    op = ops[kind]

    @partial(jax.jit, donate_argnums=(0,), static_argnames=())
    def run(state, seed):
        def body(carry, step):
            return op(carry, step, seed), ()

        state, _ = lax.scan(body, state, jnp.arange(k, dtype=jnp.int32))
        return state, state[0].sum().astype(jnp.float32)

    return run


def time_op(kind, m, k, r, c, reps=5, seed0=100):
    run = make_op(kind, m, k, r, c)
    state = jnp.zeros((N, D), jnp.float32) + 0.01
    state, v = run(state, jnp.int32(seed0))
    float(v)
    times = []
    for rep in range(reps):
        t0 = time.perf_counter()
        state, v = run(state, jnp.int32(seed0 + 1 + rep))
        float(v)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def check_correctness(m, r, c):
    step = jnp.int32(3)
    seed = jnp.int32(5)
    ids = gen_ids_sorted(m, N, step, seed)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    g = gen_grads(m, step)
    acc = jnp.abs(table[:, 0]) + 1e-3

    rows_k = block_sorted_lookup(table, ids, r=r, c=c)
    rows_x = jnp.take(table, ids, axis=0)
    ge = float(jnp.abs(rows_k - rows_x).max())
    print(f"gather f32 max err: {ge}", file=sys.stderr, flush=True)
    assert ge == 0.0, f"f32 lookup must be exact, got {ge}"

    t_k, a_k = block_sorted_rowwise_adagrad(table, acc, ids, g, 0.01, 1e-10, r=r, c=c)
    t_x, a_x = opt_lib.dense_rowwise_adagrad(table, acc, ids, g, 0.01, 1e-10, ids_sorted=True)
    te = float(jnp.abs(t_k - t_x).max())
    ae = float(jnp.abs(a_k - a_x).max())
    print(f"update f32 table/acc err: {te} {ae}", file=sys.stderr, flush=True)
    assert te < 1e-5 and ae < 1e-4, (te, ae)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    r = int(sys.argv[sys.argv.index("--r") + 1]) if "--r" in sys.argv else 512
    c = int(sys.argv[sys.argv.index("--c") + 1]) if "--c" in sys.argv else 512
    kinds = [
        "xla_gather", "kernel_gather_f32", "kernel_gather_bf16",
        "xla_update_sorted_hint", "kernel_update_f32", "kernel_update_bf16",
    ]
    if "--kinds" in sys.argv:
        kinds = sys.argv[sys.argv.index("--kinds") + 1].split(",")
    check_correctness(262_144, r, c)
    out = []
    ms = (262_144, 65_536)
    if "--m" in sys.argv:
        ms = tuple(int(x) for x in sys.argv[sys.argv.index("--m") + 1].split(","))
    for m in ms:
        for kind in kinds:
            t1 = time_op(kind, m, K, r, c, seed0=100)
            t2 = time_op(kind, m, 2 * K, r, c, seed0=9000)
            per_step = (t2 - t1) / K
            rec = {
                "op": kind, "m": m, "r": r, "c": c,
                "per_step_ms": round(per_step * 1e3, 3),
                "ns_per_slot": round(per_step / m * 1e9, 2),
            }
            out.append(rec)
            print(json.dumps(rec), flush=True)
    print(json.dumps({"all": out}))


if __name__ == "__main__":
    main()
