"""Random row permute/gather cost vs row size on the real chip.

Decides the sorted-candidate-path design (DESIGN §8): the item tower's two
~2.9 ms crossings (forward table take + backward grad permute, both
[262k, 128] f32) could be replaced by one block gather + two permutes of the
[262k, 64] FINAL candidate embeddings — a win only if random row gathers are
BYTES-bound (cost tracks row size), not row-LATENCY-bound (cost tracks row
count). Times jnp.take with a random permutation at several (rows, dim,
dtype) points inside one dispatch via the (2K-K) difference.

Run:  nohup python tools/probe_permute.py > /tmp/probe_permute.log 2>&1 &
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


def time_take(m: int, d: int, dtype: str, scatter: bool = False,
              reps: int = 5, bitcast: bool = False) -> float:
    dt = jnp.dtype(dtype)

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(x, perm, k):
        def body(carry, i):
            x, perm = carry
            # rotate the permutation each step so dispatch payloads/work
            # differ; the rotation is O(m) int32, negligible next to the take
            perm = jnp.roll(perm, 1)
            if scatter and bitcast:
                xi = jax.lax.bitcast_convert_type(x, jnp.int32)
                y = jnp.zeros_like(xi).at[perm].set(xi)
                y = jax.lax.bitcast_convert_type(y, x.dtype)
            elif scatter:
                y = jnp.zeros_like(x).at[perm].set(x)
            elif bitcast:
                # f32 -> int32 view, gather at int granularity, view back
                y = jax.lax.bitcast_convert_type(
                    jnp.take(jax.lax.bitcast_convert_type(x, jnp.int32),
                             perm, axis=0), x.dtype)
            else:
                y = jnp.take(x, perm, axis=0)
            return (y, perm), y[0, 0].astype(jnp.float32)

        (x, perm), outs = jax.lax.scan(body, (x, perm), jnp.arange(k))
        return x, outs[-1]

    key = jax.random.key(d * 7 + (1 if scatter else 0))
    x = jax.random.normal(key, (m, d), jnp.float32).astype(dt)
    perm = jax.random.permutation(jax.random.key(d + 13), m).astype(jnp.int32)
    x, v = run(x, perm, K)
    float(v)
    x, v = run(x, perm, 2 * K)
    float(v)
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        x, v = run(x, perm, K)
        float(v)
        t1 = time.perf_counter()
        x, v = run(x, perm, 2 * K)
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
    out = []
    cases = [
        (M, 128, "float32", False, False),
        (M, 128, "int32", False, False),
        (M, 128, "float32", False, True),   # f32 table, int32-bitcast gather
        (M, 64, "int32", False, False),
        (M, 32, "int32", False, False),
        (M, 128, "bfloat16", False, False),
        (M, 128, "float32", True, False),   # scatter variant of the crossing
        (M, 128, "int32", True, False),
        (M, 128, "float32", True, True),    # f32 scatter through int32 view
    ]
    for m, d, dtype, scatter, bc in cases:
        ms = time_take(m, d, dtype, scatter, bitcast=bc)
        rec = {"rows": m, "dim": d, "dtype": dtype,
               "op": ("scatter" if scatter else "take") + ("+bitcast" if bc else ""),
               "ms": round(ms, 3),
               "gb_per_s": round(2 * m * d * jnp.dtype(dtype).itemsize / ms / 1e6, 1)}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"all": out}))


if __name__ == "__main__":
    main()
