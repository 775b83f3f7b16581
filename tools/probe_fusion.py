"""Is the fast [N,64] f32 take real, or a gather+sum fusion artifact?

probe_halves: single take f32[49688,64] + .sum() = 0.67 ms.
probe_split_prod: TWO such takes (h0, h1) = 3.4 ms — not 1.34.

Hypothesis: `take(x, ids).sum()` fuses into a gather-reduce that never
materializes [M,64] (and possibly lowers as a segment/bag sum); a
materialized gather stays in the ~2.8 ms class regardless of width. These
cases separate "gather output consumed by a reduction" from "gather output
consumed by real compute" (a [D, 8] matmul — the tower's first layer shape
class, forces materialization-like usage but is itself negligible).

  h64_sum        take f32[49688,64] -> sum              (probe_halves repro)
  h64_mat        take f32[49688,64] -> @ [64, 8] -> sum
  h128_sum       take f32[49688,128] -> sum             (baseline ~2.8)
  h128_mat       take f32[49688,128] -> @ [128, 8] -> sum
  h64x2_sum      takes h0,h1 (different ids) -> sums    (split_prod repro)
  h64_fresh_sum  take on a freshly-initialized [49688,64] (layout control)
  bag_sum        take f32[49688,128] ids [B,4] -> sum axis1 -> @ [128,8]
                 (the production pooled_lookup shape: does the bag-sum fuse?)

Run: nohup python tools/probe_fusion.py > /tmp/probe_fusion.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

M = 262_144
K = 64
N = 49_688


def timed(init_carry, body, reps: int = 5) -> float:
    @functools.partial(jax.jit, static_argnums=(1,))
    def run(carry, k):
        carry, outs = jax.lax.scan(lambda c, i: body(c, i), carry,
                                   jnp.arange(k))
        return carry, outs[-1]

    c, v = run(init_carry, K)
    float(v)
    c, v = run(init_carry, 2 * K)
    float(v)
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c, v = run(init_carry, K)
        float(v)
        t1 = time.perf_counter()
        c, v = run(init_carry, 2 * K)
        float(v)
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))
    diffs.sort()
    return diffs[len(diffs) // 2] / K * 1e3


def main():
    global M, K
    if "--m" in sys.argv:
        M = int(sys.argv[sys.argv.index("--m") + 1])
    if "--k" in sys.argv:
        K = int(sys.argv[sys.argv.index("--k") + 1])
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    x128 = jax.random.normal(jax.random.key(0), (N, 128), jnp.float32)
    h0 = jnp.array(x128[:, :64])
    h1 = jnp.array(x128[:, 64:])
    fresh = jax.random.normal(jax.random.key(9), (N, 64), jnp.float32)
    w64 = jax.random.normal(jax.random.key(4), (64, 8), jnp.float32)
    w128 = jax.random.normal(jax.random.key(5), (128, 8), jnp.float32)
    ids = jax.random.randint(jax.random.key(1), (M,), 0, N, jnp.int32)
    ids_bag = jax.random.randint(jax.random.key(2), (M // 4, 4), 0, N,
                                 jnp.int32)

    def c_h64_sum(c, i):
        h0, ids = c
        ids = jnp.roll(ids, 1)
        return (h0, ids), jnp.take(h0, ids, axis=0).sum()

    def c_h64_mat(c, i):
        h0, ids, w = c
        ids = jnp.roll(ids, 1)
        return (h0, ids, w), (jnp.take(h0, ids, axis=0) @ w).sum()

    def c_h128_sum(c, i):
        x, ids = c
        ids = jnp.roll(ids, 1)
        return (x, ids), jnp.take(x, ids, axis=0).sum()

    def c_h128_mat(c, i):
        x, ids, w = c
        ids = jnp.roll(ids, 1)
        return (x, ids, w), (jnp.take(x, ids, axis=0) @ w).sum()

    def c_h64x2_sum(c, i):
        h0, h1, ids = c
        ids = jnp.roll(ids, 1)
        return (h0, h1, ids), (jnp.take(h0, ids, axis=0).sum()
                               + jnp.take(h1, jnp.roll(ids, 7), axis=0).sum())

    def c_h64_fresh_sum(c, i):
        f, ids = c
        ids = jnp.roll(ids, 1)
        return (f, ids), jnp.take(f, ids, axis=0).sum()

    def c_bag_sum(c, i):
        x, idsb, w = c
        idsb = jnp.roll(idsb, 1, axis=0)
        pooled = jnp.take(x, idsb, axis=0).sum(axis=1)  # [B, 128]
        return (x, idsb, w), (pooled @ w).sum()

    cases = [
        ("h64_sum", (h0, ids), c_h64_sum),
        ("h64_mat", (h0, ids, w64), c_h64_mat),
        ("h128_sum", (x128, ids), c_h128_sum),
        ("h128_mat", (x128, ids, w128), c_h128_mat),
        ("h64x2_sum", (h0, h1, ids), c_h64x2_sum),
        ("h64_fresh_sum", (fresh, ids), c_h64_fresh_sum),
        ("bag_sum", (x128, ids_bag, w128), c_bag_sum),
    ]
    out = []
    for name, carry, body in cases:
        ms = timed(carry, body)
        rec = {"case": name, "ms": round(ms, 3)}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"all": out}))


if __name__ == "__main__":
    main()
