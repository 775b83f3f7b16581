"""Can an int16 bitcast view make f32 row gathers fast on TPU?

On-chip probes (probe_permute, probe_gather_parts) show random row gathers
are fast for <=2-byte element types at ANY table size (bf16[262k,128] take
0.68 ms, int8[49688,128] 0.62 ms) but ~3 ms for 4-byte types except narrow
rows from <64k-row tables (int32[49688,32] 0.68 ms vs int32[262144,32]
3.03 ms; f32 slow everywhere). Hypothesis: viewing an f32 [N, D] table as
int16 [N, 2D] turns every pure-movement gather/permute into the fast class.
Targets: the item forward gather (f32[49688,128], 2.91 ms in the step
budget) and the item-update grad permute (f32[262144,128], ~2.9 ms class).

Cases (all gather M=262144 ids, (2K-K) scan-differenced):
  item_f32        take on f32[49688,128]          (baseline, ~2.8)
  item_view16pre  take on a PRE-bitcast int16[49688,256] table, cast back
  item_view16in   bitcast+reshape inside the step (true inline net cost)
  perm_f32        take on f32[262144,128] (grad-permute shape, ~3.0)
  perm_view16pre  same via pre-bitcast int16[262144,256]
  perm_view16in   same, bitcast inline
  user_f32        take on f32[206209,128] (user-table shape)
  user_view16in   same, bitcast inline

Run:  nohup python tools/probe_view16.py > /tmp/probe_view16.log 2>&1 &
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


def timed(x, ids, body, reps: int = 5) -> float:
    @functools.partial(jax.jit, static_argnums=(2,))
    def run(x, ids, k):
        def step(carry, i):
            x, ids = carry
            ids = jnp.roll(ids, 1)
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


def to16(x):
    n, d = x.shape
    return jax.lax.bitcast_convert_type(x, jnp.int16).reshape(n, 2 * d)


def take16(x16, ids, d):
    rows = jnp.take(x16, ids, axis=0)
    return jax.lax.bitcast_convert_type(rows.reshape(-1, d, 2), jnp.float32)


def main():
    global M, K
    if "--m" in sys.argv:
        M = int(sys.argv[sys.argv.index("--m") + 1])
    if "--k" in sys.argv:
        K = int(sys.argv[sys.argv.index("--k") + 1])
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    d = 128
    out = []
    for name, rows in (("item", 49_688), ("perm", 262_144), ("user", 206_209)):
        xf = jax.random.normal(jax.random.key(rows), (rows, d), jnp.float32)
        ids = jax.random.randint(jax.random.key(rows + 1), (M,), 0, rows,
                                 jnp.int32)
        cases = [
            (f"{name}_f32", xf,
             lambda x, i: jnp.take(x, i, axis=0).sum()),
            (f"{name}_view16pre", to16(xf),
             lambda x, i: take16(x, i, d).sum()),
            (f"{name}_view16in", xf,
             lambda x, i: take16(to16(x), i, d).sum()),
        ]
        if name == "perm":
            # scatter (set) through the view: the inverse-permute twin
            perm = jax.random.permutation(jax.random.key(7), rows)
            cases.append((
                f"{name}_scatter_f32", xf,
                lambda x, i: jnp.zeros_like(x).at[perm].set(x)[0, 0],
            ))
            cases.append((
                f"{name}_scatter_view16in", xf,
                lambda x, i: jax.lax.bitcast_convert_type(
                    jnp.zeros_like(to16(x)).at[perm].set(to16(x))
                    .reshape(-1, d, 2), jnp.float32)[0, 0],
            ))
        for cname, x, body in cases:
            ms = timed(x, ids, body)
            rec = {"case": cname, "ms": round(ms, 3)}
            out.append(rec)
            print(json.dumps(rec), flush=True)
    print(json.dumps({"all": out}))


if __name__ == "__main__":
    main()
