"""Gather speed vs CONSUMER and the same-ids re-merge effect.

probe_fusion established: f32 [49688,128] take is 2.8 ms with a reduce
consumer but 0.64 ms feeding a matmul; [N,64] takes are fast (0.65) with any
consumer tested; two [N,64] takes with DIFFERENT ids cost 1.43 but with the
same ids (probe_split_prod) 3.4 — XLA appears to re-merge same-id half
gathers into one wide (slow-class) gather.

  same_ids        take(h0, ids) + take(h1, ids), sums        (expect ~3.4)
  same_ids_bar    ids2 = optimization_barrier(ids)           (expect ~1.4)
  h128_pallas     take f32[49688,128] -> pallas identity     (permute class:
                  does a pallas consumer keep the slow emitter?)
  h128_perm_mat   permute-take [262144,128] -> @ [128,8]     (matmul consumer
                  on the GRAD-permute shape)
  h64x2_pallas    two barrier-id [N,64] takes -> pallas      (the split-permute
                  candidate for the item-update grad permute)

Run: nohup python tools/probe_consumer.py > /tmp/probe_consumer.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

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


def _sum_kernel(x_ref, o_ref):
    o_ref[:, :] = jnp.sum(x_ref[:]).reshape(1, 1)


def pallas_sum(x):
    m, d = x.shape
    grid = m // 512
    out = pl.pallas_call(
        _sum_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((512, d), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(x.astype(jnp.float32))
    return out[0, 0]


def pallas_sum2(a, b):
    m, d = a.shape
    grid = m // 512
    out = pl.pallas_call(
        lambda a_ref, b_ref, o_ref: o_ref.__setitem__(
            (slice(None), slice(None)),
            (jnp.sum(a_ref[:]) + jnp.sum(b_ref[:])).reshape(1, 1)),
        grid=(grid,),
        in_specs=[pl.BlockSpec((512, d), lambda i: (i, 0)),
                  pl.BlockSpec((512, d), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(a, b)
    return out[0, 0]


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
    w128 = jax.random.normal(jax.random.key(5), (128, 8), jnp.float32)
    ids = jax.random.randint(jax.random.key(1), (M,), 0, N, jnp.int32)
    gm = jax.random.normal(jax.random.key(3), (M, 128), jnp.float32)
    g0 = jnp.array(gm[:, :64])
    g1 = jnp.array(gm[:, 64:])
    perm = jax.random.permutation(jax.random.key(2), M).astype(jnp.int32)

    def c_same_ids(c, i):
        h0, h1, ids = c
        ids = jnp.roll(ids, 1)
        return (h0, h1, ids), (jnp.take(h0, ids, axis=0).sum()
                               + jnp.take(h1, ids, axis=0).sum())

    def c_same_ids_bar(c, i):
        h0, h1, ids = c
        ids = jnp.roll(ids, 1)
        ids2 = jax.lax.optimization_barrier(ids)
        return (h0, h1, ids), (jnp.take(h0, ids, axis=0).sum()
                               + jnp.take(h1, ids2, axis=0).sum())

    def c_h128_pallas(c, i):
        x, ids = c
        ids = jnp.roll(ids, 1)
        return (x, ids), pallas_sum(jnp.take(x, ids, axis=0))

    def c_h128_perm_mat(c, i):
        g, perm, w = c
        perm = jnp.roll(perm, 1)
        g = g * 1.000001 + 1e-7
        return (g, perm, w), (jnp.take(g, perm, axis=0) @ w).sum()

    def c_h64x2_pallas(c, i):
        g0, g1, perm = c
        perm = jnp.roll(perm, 1)
        p2 = jax.lax.optimization_barrier(perm)
        return (g0, g1, perm), pallas_sum2(
            jnp.take(g0, perm, axis=0), jnp.take(g1, p2, axis=0))

    cases = [
        ("same_ids", (h0, h1, ids), c_same_ids),
        ("same_ids_bar", (h0, h1, ids), c_same_ids_bar),
        ("h128_pallas", (x128, ids), c_h128_pallas),
        ("h128_perm_mat", (gm, perm, w128), c_h128_perm_mat),
        ("h64x2_pallas", (g0, g1, perm), c_h64x2_pallas),
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
