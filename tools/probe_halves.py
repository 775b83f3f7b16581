"""Half-row gathers: is `row_bytes <= 256 AND (rows < 64k OR elem <= 2B)`
the fast-gather rule, and does splitting [N,128] f32 into two 256B-row
gathers beat the 2.8 ms whole-row take?

Prior on-chip data: fast (0.62-0.73 ms @262k ids) = int8[49688,128],
int32[49688,32/33], bf16[262144,64/128]; slow (~2.8-3.0) = f32 everywhere,
int32[262144,*], int16[*,256] (512B rows).

Cases:
  item_f32_whole     take f32[49688,128]                (baseline 2.8)
  item_i32_half      take int32[49688,64]               (rule: fast)
  item_f32_half      take f32[49688,64]                 (is FLOAT excluded?)
  item_split2        two int32-view half gathers + concat, net  (target ~1.4)
  perm_i16_128       take int16[262144,128]             (2-byte @256B rows)
  perm_bf16_128      take bf16[262144,128]              (known fast, control)
  user_f32_half      take f32[206209,64]
  user_i32_half      take int32[206209,64]
  item_split4        four int32[49688,32] gathers + concat, net

Run: nohup python tools/probe_halves.py > /tmp/probe_halves.log 2>&1 &
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
            return (x, ids), body(x, ids)

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


def split2(x, i):
    x32 = jax.lax.bitcast_convert_type(x, jnp.int32)  # layout-free
    a = jnp.take(x32[:, :64], i, axis=0)
    b = jnp.take(x32[:, 64:], i, axis=0)
    out = jax.lax.bitcast_convert_type(
        jnp.concatenate([a, b], axis=1), jnp.float32)
    return out.sum()


def split4(x, i):
    x32 = jax.lax.bitcast_convert_type(x, jnp.int32)
    parts = [jnp.take(x32[:, j * 32:(j + 1) * 32], i, axis=0)
             for j in range(4)]
    out = jax.lax.bitcast_convert_type(
        jnp.concatenate(parts, axis=1), jnp.float32)
    return out.sum()


def main():
    global M, K
    if "--m" in sys.argv:
        M = int(sys.argv[sys.argv.index("--m") + 1])
    if "--k" in sys.argv:
        K = int(sys.argv[sys.argv.index("--k") + 1])
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    def mk(rows, d, dt):
        x = jax.random.normal(jax.random.key(rows + d), (rows, d), jnp.float32)
        x = x.astype(dt) if dt != "int32_cast" else (x * 100).astype(jnp.int32)
        return x

    def ids_for(rows):
        return jax.random.randint(jax.random.key(rows), (M,), 0, rows,
                                  jnp.int32)

    take_sum = lambda x, i: jnp.take(x, i, axis=0).sum().astype(jnp.float32)
    cases = [
        ("item_f32_whole", mk(49_688, 128, jnp.float32), 49_688, take_sum),
        ("item_i32_half", mk(49_688, 64, "int32_cast"), 49_688, take_sum),
        ("item_f32_half", mk(49_688, 64, jnp.float32), 49_688, take_sum),
        ("item_split2", mk(49_688, 128, jnp.float32), 49_688, split2),
        ("perm_i16_128", (mk(262_144, 128, jnp.float32) * 50)
         .astype(jnp.int16), 262_144, take_sum),
        ("perm_bf16_128", mk(262_144, 128, jnp.bfloat16), 262_144, take_sum),
        ("user_f32_half", mk(206_209, 64, jnp.float32), 206_209, take_sum),
        ("user_i32_half", mk(206_209, 64, "int32_cast"), 206_209, take_sum),
        ("item_split4", mk(49_688, 128, jnp.float32), 49_688, split4),
    ]
    out = []
    for name, x, rows, body in cases:
        ms = timed(x, ids_for(rows), body)
        rec = {"case": name, "ms": round(ms, 3)}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"all": out}))


if __name__ == "__main__":
    main()
