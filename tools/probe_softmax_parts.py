"""On-chip decomposition of the fused sampled-softmax kernel: time the
forward (lse) pass and the two backward recompute passes separately, plus
the scan-path equivalent, at the bench shape (bs=65536, d=64->128 padded).

(2K-K)-difference methodology on an in-jit lax.scan chain so dispatch/RTT
cancels (tools/bench_step_device.py). Run on the real chip:

    python tools/probe_softmax_parts.py [--bs 65536] [--reps 3]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

K = 8


def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def time_fn(step, x0, reps=3, k=K):
    """median per-step seconds of `step` chained k times inside one jit."""

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(x, n):
        def body(c, i):
            # fold the iteration index in so steps cannot be CSE'd
            return step(c, i), ()

        c, _ = jax.lax.scan(body, x, jnp.arange(n, dtype=jnp.int32))
        return c

    r = jax.block_until_ready(run(x0, k))
    r = jax.block_until_ready(run(x0, 2 * k))
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0, k))
        t1 = time.perf_counter()
        jax.block_until_ready(run(x0, 2 * k))
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))
    return median(diffs) / k


def main():
    bs = int(sys.argv[sys.argv.index("--bs") + 1]) if "--bs" in sys.argv else 65536
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 3
    d = 64  # production tower output; the wrapper pads to 128

    from two_tower_recommender_model_tpu.models.losses import (
        _chunked_sampled_softmax,
    )
    from two_tower_recommender_model_tpu.ops.softmax_kernel import (
        sampled_softmax_fused,
    )

    key = jax.random.key(0)
    q0 = jax.random.normal(key, (bs, d), jnp.float32) * 0.1
    c0 = jax.random.normal(jax.random.key(1), (bs, d), jnp.float32) * 0.1
    ids = jnp.arange(bs, dtype=jnp.int32) % 49688
    labels = jnp.ones((bs,), jnp.float32)
    print(f"devices: {jax.devices()}  bs={bs} d={d}", flush=True)

    def perturb(x, i):
        # byte-distinct chained state without changing magnitudes much
        return x * (1.0 + 1e-6 * (i % 3).astype(jnp.float32))

    results = {}

    # fused kernel: fwd only (loss value, no grad)
    def fwd_only(x, i):
        x = perturb(x, i)
        loss = sampled_softmax_fused(x, c0, labels, ids, None, 0.7)
        return x + 0.0 * loss

    results["kernel_fwd"] = time_fn(fwd_only, q0, reps)
    print(json.dumps({"part": "kernel_fwd",
                      "ms": round(results["kernel_fwd"] * 1e3, 2)}), flush=True)

    # fused kernel: fwd + full vjp (fwd + dq pass + dc pass)
    def fwd_bwd(x, i):
        x = perturb(x, i)
        l, (dq, dc) = jax.value_and_grad(
            lambda q, c: sampled_softmax_fused(q, c, labels, ids, None, 0.7),
            argnums=(0, 1))(x, c0)
        return x + 1e-9 * (dq + dc)

    results["kernel_fwd_bwd"] = time_fn(fwd_bwd, q0, reps)
    print(json.dumps({"part": "kernel_fwd_bwd",
                      "ms": round(results["kernel_fwd_bwd"] * 1e3, 2)}), flush=True)

    # scan path at several row-chunk sizes (r=256 is what
    # _auto_row_chunk picks at bs=65536; the r2 target assumed [R, B] blocks
    # round-trip HBM — at small r XLA keeps them VMEM-resident instead)
    for r in (128, 256, 512):
        def scan_fwd_bwd(x, i, r=r):
            x = perturb(x, i)
            l, (dq, dc) = jax.value_and_grad(
                lambda q, c: _chunked_sampled_softmax(
                    q, c, labels, ids, None, 0.7, r),
                argnums=(0, 1))(x, c0)
            return x + 1e-9 * (dq + dc)

        results[f"scan_fwd_bwd_r{r}"] = time_fn(scan_fwd_bwd, q0, reps)
        print(json.dumps({"part": f"scan_fwd_bwd_r{r}",
                          "ms": round(results[f"scan_fwd_bwd_r{r}"] * 1e3, 2)}),
              flush=True)
    results["scan_fwd_bwd"] = results["scan_fwd_bwd_r512"]
    results["scan_fwd"] = 0.0

    # MXU floor reference: one [B, D] @ [D, B] bf16 matmul (a score pass).
    # The product must feed a REDUCTION over all columns — a sliced consumer
    # lets XLA dead-code-eliminate all but d columns (the r4 first draft
    # measured -0.01 ms that way).
    def one_matmul(x, i):
        x = perturb(x, i)
        s = jax.lax.dot_general(
            x.astype(jnp.bfloat16), c0.T.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return x + 1e-9 * jnp.sum(s, axis=1, keepdims=True)[:, :d]

    results["one_score_matmul"] = time_fn(one_matmul, q0, reps)
    print(json.dumps({"part": "one_score_matmul",
                      "ms": round(results["one_score_matmul"] * 1e3, 2)}),
          flush=True)

    out = {k: round(v * 1e3, 2) for k, v in results.items()}
    out["kernel_bwd_marginal"] = round(
        (results["kernel_fwd_bwd"] - results["kernel_fwd"]) * 1e3, 2)
    out["scan_bwd_marginal"] = round(
        (results["scan_fwd_bwd"] - results["scan_fwd"]) * 1e3, 2)
    print(json.dumps({"all": out}), flush=True)


if __name__ == "__main__":
    main()
