"""Device-only train-step time: f32 vs +sorted vs +sorted+bf16buf.

The pipelined hot loop on this rig is dispatch/H2D-bound with ~±30% window
jitter (tunnel contention), which hides device-side step improvements. This
bench isolates the DEVICE step: K full train steps run inside ONE dispatch
(`lax.scan` chained on donated state), each step reading a distinct real
PackedBatch from an on-device pool transferred once up front. Timing is the
(2K - K)-dispatch difference, so constant dispatch/RTT overheads cancel.

Run:  nohup python tools/bench_step_device.py > /tmp/step_device_bench.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from two_tower_recommender_model_tpu import config as cfg_lib
from two_tower_recommender_model_tpu.data import SyntheticClickstream
from two_tower_recommender_model_tpu.data.device_featurizer import (
    PackedFeaturizer,
    unpack_batch,
)
from two_tower_recommender_model_tpu.train.step import create_train_state, make_train_step

N_USERS, N_ITEMS = 206_209, 49_688
POOL = 8
K = 32
DEVICE_POOL = False  # --device-pool: generate the pool on device (no H2D)


def build(variant: str, batch_size: int, num_users: int | None = None):
    # Share bench.py's '+'-separated tag grammar (tests lock it there) so the
    # same spec string means the same config in both tools.
    from bench import parse_variant, variant_compute_dtype

    _dtype, sort, bf16buf, _compact, bsk, _delta = parse_variant(variant)
    tags = variant.split("+")[1:]
    mcfg = cfg_lib.two_tower_model_config(
        num_users=num_users or N_USERS, num_items=N_ITEMS,
        embedding_dim=128, layer_sizes=(128, 64),
        compute_dtype=variant_compute_dtype(variant),
    )
    if _dtype not in ("float32", "f32"):
        # 'int8+...'/'bfloat16+...' prefixes set the TABLE storage dtype
        # (bench_phase.py treats the prefix the same way)
        import dataclasses as _dc

        mcfg = _dc.replace(mcfg, table_dtype=_dtype)
    tcfg = cfg_lib.TrainConfig(
        batch_size=batch_size,
        sorted_feature="user_id" if sort else None,
        scatter_buffer_dtype="bfloat16" if bf16buf else "float32",
        block_sorted_kernel=bsk,
        loss="sampled_softmax" if {"softmax", "softmaxscan",
                                   "softmaxkernel"} & set(tags)
             else "bce",
        # '+softmax' = production routing ("auto": scan single-device per the
        # r4 measurement); '+softmaxscan' pins the scan path; '+softmaxkernel'
        # forces the fused Pallas kernel — the kernel-vs-scan A/B pair
        softmax_kernel=("off" if "softmaxscan" in tags
                        else "on" if "softmaxkernel" in tags else "auto"),
        # '+dsgather' routes unsorted single-slot gathers through the
        # device-sort block-kernel front-end (device_sorted_lookup)
        device_sorted_gather="dsgather" in tags,
        # '+xlagather' keeps block-kernel UPDATES but plain XLA takes for
        # forward gathers (the fast matmul-consumer gather class,
        # tools/probe_fusion.py)
        block_sorted_gather="xlagather" not in tags,
    )
    if DEVICE_POOL:
        from two_tower_recommender_model_tpu.data.device_pool import (
            device_batch_pool,
        )

        pool = device_batch_pool(mcfg, batch_size, POOL,
                                 pack_label=True, sort=sort, seed=0)
    else:
        feat = PackedFeaturizer(mcfg, pack_label=True,
                                sort_feature="user_id" if sort else None)
        ds = SyntheticClickstream(num_users=N_USERS, num_items=N_ITEMS, seed=0)
        pool_np = np.stack(
            [feat(ds.sample(batch_size, start=i)).ids_raw for i in range(POOL)]
        )
        pool = jnp.asarray(pool_np)  # [P, B, S] transferred once

    state, dense_opt = create_train_state(jax.random.key(0), mcfg, tcfg)
    core = make_train_step(mcfg, tcfg, dense_opt, donate=False, jit=False)

    def run_k(k):
        @partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
        def run(state, pool, k):
            def body(carry, i):
                pb_ids = jax.lax.dynamic_index_in_dim(pool, i % POOL, keepdims=False)
                from two_tower_recommender_model_tpu.data.device_featurizer import (
                    PackedBatch,
                )

                batch = unpack_batch(
                    PackedBatch(ids_raw=pb_ids, labels=jnp.zeros(0, jnp.int32)),
                    mcfg, pack_label=True,
                )
                carry, out = core(carry, batch)
                return carry, out["loss"]

            state, losses = jax.lax.scan(body, state, jnp.arange(k, dtype=jnp.int32))
            return state, losses[-1]

        return run

    return state, pool, run_k


def time_variant(variant: str, batch_size: int, reps: int = 5,
                 num_users: int | None = None):
    state, pool, run_k = build(variant, batch_size, num_users=num_users)
    r1, r2 = run_k(K), run_k(2 * K)
    state, v = r1(state, pool, K)  # compile + warm
    float(v)
    state, v = r2(state, pool, 2 * K)
    float(v)
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, v = r1(state, pool, K)
        float(v)
        t1 = time.perf_counter()
        state, v = r2(state, pool, 2 * K)
        float(v)
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))  # K extra steps
    diffs.sort()
    per_step = diffs[len(diffs) // 2] / K
    rec = {
        "variant": variant,
        "batch_size": batch_size,
        "step_ms": round(per_step * 1e3, 3),
        "device_examples_per_sec": round(batch_size / per_step, 0),
    }
    if num_users:
        rec["num_users"] = num_users
    return rec


def crossover(sizes, variants, batch_size):
    """--crossover: the int8-vs-f32 regime sweep (VERDICT r4 weak #3).

    DESIGN §8b argues from the bandwidth model that int8 overtakes f32 when
    the step becomes table-bandwidth-bound — at user-table row counts
    10-100x the flagship's 206k, where a 262k-batch of uniform ids touches
    ~B distinct rows and the gather+update traffic stops being noise
    against the MXU floor. This mode MEASURES that claim: same step, same
    kernels, user table scaled to `sizes` rows, ids uniform over the full
    table (device-generated pool), f32 vs int8 storage."""
    out = []
    for n in sizes:
        for variant in variants:
            try:
                rec = time_variant(variant, batch_size, num_users=n)
            except Exception as e:  # a variant OOMing must not kill the sweep
                rec = {"variant": variant, "batch_size": batch_size,
                       "num_users": n, "error": f"{type(e).__name__}: {e}"[:1500]}
            out.append(rec)
            print(json.dumps(rec), flush=True)
    return out


def main():
    global DEVICE_POOL
    if "--device-pool" in sys.argv:
        DEVICE_POOL = True
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    if "--crossover" in sys.argv:
        DEVICE_POOL = True  # scaled tables need full-table uniform ids; no H2D
        sizes = (2_000_000, 8_000_000, 20_000_000)
        if "--users" in sys.argv:
            sizes = tuple(int(x) for x in
                          sys.argv[sys.argv.index("--users") + 1].split(","))
        variants = ("f32+sorted+blockkernel", "int8+sorted+blockkernel",
                    "f32+sorted+blockkernel-bf16+bf16compute",
                    "int8+sorted+blockkernel+bf16compute")
        if "--variants" in sys.argv:
            variants = tuple(sys.argv[sys.argv.index("--variants") + 1].split(","))
        bs = 262_144
        if "--bs" in sys.argv:
            bs = int(sys.argv[sys.argv.index("--bs") + 1])
        out = crossover(sizes, variants, bs)
        print(json.dumps({"crossover": out}))
        # merge into the committed artifact (bench.py attaches it to the
        # record as `int8_crossover`); keyed on (variant, num_users) so
        # partial sweeps accumulate
        art = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "CROSSOVER.json")
        try:
            with open(art) as f:
                rows = {(r["variant"], r["num_users"]): r
                        for r in json.load(f)["rows"]}
        except (OSError, ValueError, KeyError):
            rows = {}
        for r in out:
            rows[(r["variant"], r.get("num_users"))] = r
        with open(art, "w") as f:
            json.dump({"batch_size": bs,
                       "methodology": "(2K-K)-dispatch difference, "
                       "device-generated pools (wire-proof)",
                       "rows": sorted(rows.values(),
                                      key=lambda r: (r.get("num_users") or 0,
                                                     r["variant"]))}, f, indent=1)
        return
    out = []
    variants = ("f32", "f32+sorted", "f32+sorted+bf16buf")
    if "--variants" in sys.argv:
        variants = tuple(sys.argv[sys.argv.index("--variants") + 1].split(","))
    sizes = (262_144, 65_536)
    if "--bs" in sys.argv:
        sizes = tuple(int(x) for x in sys.argv[sys.argv.index("--bs") + 1].split(","))
    for bs in sizes:
        for variant in variants:
            rec = time_variant(variant, bs)
            out.append(rec)
            print(json.dumps(rec), flush=True)
    print(json.dumps({"all": out}))


if __name__ == "__main__":
    main()
