"""Decompose the quantized item-gather cost on the real chip.

The int8 item gather measured 4.6-4.7 ms vs f32's 2.9 ms at [262k] ids from
a [49688, ...] table, and the int32-bitcast row gather did NOT move it —
this probe separates the candidates inside one (2K-K)-differenced dispatch:

  f32_rows      jnp.take on [n, 128] f32        (the f32 baseline)
  int8_rows     jnp.take on [n, 128] int8       (raw 1-byte row gather)
  int8_packed   jnp.take on the int32-bitcast view [n, 32]
  scales_elem   jnp.take on [n] f32             (per-id SCALE gather)
  scales_2d     jnp.take on [n, 1]->broadcast   (row-shaped scale gather)
  int8_full     the production quantized path (rows+scales+dequant)
  fused_scale   ONE [n, 132]-byte row gather carrying values+scale bytes

Run:  nohup python tools/probe_gather_parts.py > /tmp/probe_gather_parts.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

N, M, D = 49_688, 262_144, 128
K = 64


def timed(make_case, reps: int = 5) -> float:
    x, ids, body = make_case()

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(x, ids, k):
        def step(carry, i):
            x, ids = carry
            ids = jnp.roll(ids, 1)  # distinct work each step
            out = body(x, ids)
            return (x, ids), out

        (x, ids), outs = jax.lax.scan(step, (x, ids), jnp.arange(k))
        return x, outs[-1]

    x, v = run(x, ids, K)
    float(v)
    x, v = run(x, ids, 2 * K)
    float(v)
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        x, v = run(x, ids, K)
        float(v)
        t1 = time.perf_counter()
        x, v = run(x, ids, 2 * K)
        float(v)
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))
    diffs.sort()
    return diffs[len(diffs) // 2] / K * 1e3


def main():
    global N, M, K
    for flag, g in (("--n", "N"), ("--m", "M"), ("--k", "K")):
        if flag in sys.argv:
            globals()[g] = int(sys.argv[sys.argv.index(flag) + 1])
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    kv = jax.random.key(0)
    vals8 = jax.random.randint(kv, (N, D), -127, 128, jnp.int32).astype(jnp.int8)
    valsf = jax.random.normal(jax.random.key(1), (N, D), jnp.float32)
    scales = jax.random.uniform(jax.random.key(2), (N,), jnp.float32) + 0.5
    ids = jax.random.randint(jax.random.key(3), (M,), 0, N, jnp.int32)
    packed = jax.lax.bitcast_convert_type(vals8.reshape(N, D // 4, 4), jnp.int32)
    # fused row: 128 int8 values + the f32 scale's 4 bytes, one 132B row
    scale_bytes = jax.lax.bitcast_convert_type(scales[:, None], jnp.int32)
    fused = jnp.concatenate([packed, scale_bytes], axis=1)  # [N, 33] int32

    cases = {
        "f32_rows": lambda: (valsf, ids, lambda x, i: jnp.take(x, i, axis=0).sum()),
        "int8_rows": lambda: (vals8, ids, lambda x, i: jnp.take(x, i, axis=0).astype(jnp.float32).sum()),
        "int8_packed": lambda: (packed, ids, lambda x, i: jnp.take(x, i, axis=0).sum().astype(jnp.float32)),
        "scales_elem": lambda: (scales, ids, lambda x, i: jnp.take(x, i, axis=0).sum()),
        "int8_full": lambda: (
            (vals8, scales), ids,
            lambda x, i: (jnp.take(x[0], i, axis=0).astype(jnp.float32)
                          * (jnp.take(x[1], i, axis=0) / 127.0)[:, None]).sum(),
        ),
        "fused_scale": lambda: (
            fused, ids,
            lambda x, i: (
                lambda rows: (
                    jax.lax.bitcast_convert_type(rows[:, :D // 4], jnp.int8)
                    .reshape(-1, D).astype(jnp.float32)
                    * (jax.lax.bitcast_convert_type(rows[:, D // 4:], jnp.float32)
                       / 127.0)
                ).sum()
            )(jnp.take(x, i, axis=0)),
        ),
    }
    out = []
    for name, mk in cases.items():
        ms = timed(mk)
        rec = {"case": name, "ms": round(ms, 3)}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"all": out}))


if __name__ == "__main__":
    main()
