"""Production-shaped half-gather probes.

probe_halves.py established (constant table, rolled random ids, 262k ids):
  f32/int32 [N, 64] takes: 0.66-0.68 ms at N=49688 AND N=206209
  f32 [N,128], bf16/int16 [N,128]: 2.5-2.8 ms
  inline x32[:, :64] slice + take (split2): 4.3 ms — XLA fuses the slice
  INTO the gather and keeps the slow class.

So the fast plan is: gather two CONTIGUOUS [N, 64] halves. These cases price
the end-to-end patterns the train step would actually use:

  pre_concat     pre-split halves -> 2 takes -> concat [M,128] -> sum
  pre_nocat      pre-split halves -> 2 takes consumed separately
  inline_barrier [N,128] -> slices -> optimization_barrier -> 2 takes -> concat
  bf16_half      pre-split bf16 [N,64] halves -> 2 takes -> concat
  grad_perm      in-step-produced [M,128] -> barrier-split -> 2 permute takes
                 -> concat (the item-update grad permute replacement; baseline
                 single take = 2.8)
  grad_perm_base in-step-produced [M,128] -> single permute take (control)

Run: nohup python tools/probe_split_prod.py > /tmp/probe_split_prod.log 2>&1 &
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
N_ITEM = 49_688
D = 128


def timed(init_carry, body, reps: int = 5) -> float:
    @functools.partial(jax.jit, static_argnums=(1,))
    def run(carry, k):
        def step(c, i):
            return body(c, i)

        carry, outs = jax.lax.scan(step, carry, jnp.arange(k))
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

    x = jax.random.normal(jax.random.key(0), (N_ITEM, D), jnp.float32)
    h0 = jnp.array(x[:, :64])
    h1 = jnp.array(x[:, 64:])
    b0 = h0.astype(jnp.bfloat16)
    b1 = h1.astype(jnp.bfloat16)
    ids = jax.random.randint(jax.random.key(1), (M,), 0, N_ITEM, jnp.int32)
    perm = jax.random.permutation(jax.random.key(2), M).astype(jnp.int32)

    def roll(c):
        return jnp.roll(c, 1)

    def pre_concat(c, i):
        h0, h1, ids = c
        ids = roll(ids)
        out = jnp.concatenate(
            [jnp.take(h0, ids, axis=0), jnp.take(h1, ids, axis=0)], axis=1)
        return (h0, h1, ids), out.sum()

    def pre_nocat(c, i):
        h0, h1, ids = c
        ids = roll(ids)
        return (h0, h1, ids), (jnp.take(h0, ids, axis=0).sum()
                               + jnp.take(h1, ids, axis=0).sum())

    def inline_barrier(c, i):
        x, ids = c
        ids = roll(ids)
        a, b = jax.lax.optimization_barrier((x[:, :64], x[:, 64:]))
        out = jnp.concatenate(
            [jnp.take(a, ids, axis=0), jnp.take(b, ids, axis=0)], axis=1)
        return (x, ids), out.sum()

    def bf16_half(c, i):
        b0, b1, ids = c
        ids = roll(ids)
        out = jnp.concatenate(
            [jnp.take(b0, ids, axis=0), jnp.take(b1, ids, axis=0)], axis=1)
        return (b0, b1, ids), out.sum().astype(jnp.float32)

    def grad_perm(c, i):
        g, perm = c
        perm = roll(perm)
        g = g * 1.000001 + 1e-7  # in-step-produced value (fresh buffer)
        a, b = jax.lax.optimization_barrier((g[:, :64], g[:, 64:]))
        out = jnp.concatenate(
            [jnp.take(a, perm, axis=0), jnp.take(b, perm, axis=0)], axis=1)
        return (g, perm), out.sum()

    def grad_perm_base(c, i):
        g, perm = c
        perm = roll(perm)
        g = g * 1.000001 + 1e-7
        return (g, perm), jnp.take(g, perm, axis=0).sum()

    gm = jax.random.normal(jax.random.key(3), (M, D), jnp.float32)
    cases = [
        ("pre_concat", (h0, h1, ids), pre_concat),
        ("pre_nocat", (h0, h1, ids), pre_nocat),
        ("inline_barrier", (x, ids), inline_barrier),
        ("bf16_half", (b0, b1, ids), bf16_half),
        ("grad_perm", (gm, perm), grad_perm),
        ("grad_perm_base", (gm, perm), grad_perm_base),
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
