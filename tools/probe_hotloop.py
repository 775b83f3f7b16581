"""Decompose the hot-loop gap: device-only vs end-to-end (bench.py).

Observed (BENCH_r02, bs=262k macro=16 f32+sorted): hot loop ~9.8M ex/s
(~428 ms/macro) vs device-only 15.64 ms/step => ~250 ms/macro. This probe
times each pipeline component on the real chip to find the other ~178 ms:

  A. host stack_batches (np.stack of 16 [B,2] int32)
  B. H2D device_put of one macro payload (throughput + whether it's async)
  C. dispatch+execute per macro with DEVICE-RESIDENT payloads (pool of P
     distinct macros, chained donated state, a distinct 4-byte salt folded
     into the loss per dispatch to defeat the tunnel's payload-keyed dedupe)
  D. the bench's actual loop (prefetch_to_device + device_put per macro)

Run:  nohup python tools/probe_hotloop.py > /tmp/probe_hotloop.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from two_tower_recommender_model_tpu import config as cfg_lib
from two_tower_recommender_model_tpu.data import SyntheticClickstream
from two_tower_recommender_model_tpu.data.device_featurizer import (
    PackedBatch,
    PackedFeaturizer,
    unpack_batch,
)
from two_tower_recommender_model_tpu.train.pipeline import prefetch_to_device
from two_tower_recommender_model_tpu.train.step import (
    create_train_state,
    make_train_step,
    stack_batches,
)

N_USERS, N_ITEMS = 206_209, 49_688
BS = 262_144
MACRO = 16
DEV_POOL = 6  # distinct device-resident macro payloads


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    mcfg = cfg_lib.two_tower_model_config(
        num_users=N_USERS, num_items=N_ITEMS, embedding_dim=128, layer_sizes=(128, 64)
    )
    tcfg = cfg_lib.TrainConfig(batch_size=BS, sorted_feature="user_id")
    feat = PackedFeaturizer(mcfg, pack_label=True, sort_feature="user_id")
    ds = SyntheticClickstream(num_users=N_USERS, num_items=N_ITEMS, seed=0)

    n_payload_batches = 24
    host_batches = [feat(ds.sample(BS, start=i)) for i in range(n_payload_batches)]

    # A. stack_batches
    t0 = time.perf_counter()
    reps = 5
    for r in range(reps):
        sel = [host_batches[(r + j) % n_payload_batches] for j in range(MACRO)]
        mb = stack_batches(sel)
    stack_ms = (time.perf_counter() - t0) / reps * 1e3
    payload_mb = mb.ids_raw.nbytes / 1e6
    print(json.dumps({"stack_ms": round(stack_ms, 1), "payload_mb": round(payload_mb, 1)}),
          flush=True)

    # B. H2D: distinct macro payloads; measure put-return and put+verified
    macros = []
    for r in range(6):
        sel = [host_batches[(3 * r + j) % n_payload_batches] for j in range(MACRO)]
        macros.append(stack_batches(sel))
    # warm transfer path
    x = jax.device_put(macros[0].ids_raw)
    float(jnp.sum(x[0, 0]))
    put_return, put_total = [], []
    for m in macros[1:]:
        t0 = time.perf_counter()
        x = jax.device_put(m.ids_raw)
        t1 = time.perf_counter()
        float(jnp.sum(x[0, 0]))  # forces the transfer to have landed
        t2 = time.perf_counter()
        put_return.append(t1 - t0)
        put_total.append(t2 - t0)
    rec_b = {
        "put_return_ms": round(sorted(put_return)[len(put_return) // 2] * 1e3, 1),
        "put_total_ms": round(sorted(put_total)[len(put_total) // 2] * 1e3, 1),
        "implied_h2d_gb_s": round(
            payload_mb / 1e3 / sorted(put_total)[len(put_total) // 2], 2
        ),
    }
    print(json.dumps(rec_b), flush=True)

    # C. dispatch+execute with device-resident payloads (salted per dispatch)
    state, dense_opt = create_train_state(jax.random.key(0), mcfg, tcfg)
    core = make_train_step(mcfg, tcfg, dense_opt, donate=False, jit=False)

    from functools import partial

    @partial(jax.jit, donate_argnums=(0,))
    def multi_salted(state, stacked_ids, salt):
        def body(carry, one_ids):
            pb = PackedBatch(ids_raw=one_ids, labels=jnp.zeros(0, jnp.int32))
            new_state, out = core(carry, unpack_batch(pb, mcfg, pack_label=True))
            return new_state, out["loss"]

        state, losses = jax.lax.scan(body, state, stacked_ids)
        return state, losses[-1] + 0.0 * salt

    dev_macros = [jax.device_put(m.ids_raw) for m in macros]
    for d in dev_macros:
        d.block_until_ready()
    state, v = multi_salted(state, dev_macros[0], jnp.float32(0.5))
    float(v)  # compile
    n_disp = 12
    t0 = time.perf_counter()
    for i in range(n_disp):
        state, v = multi_salted(state, dev_macros[i % DEV_POOL],
                                jnp.float32(0.001 * (i + 1)))
    lv = float(v)
    dev_macro_ms = (time.perf_counter() - t0) / n_disp * 1e3
    print(json.dumps({"device_macro_ms": round(dev_macro_ms, 1),
                      "device_eps": round(MACRO * BS / (dev_macro_ms / 1e3), 0),
                      "last_loss": round(lv, 4)}), flush=True)

    # D. the bench loop (fresh state so donation pattern matches bench)
    state2, _ = create_train_state(jax.random.key(1), mcfg, tcfg)
    from two_tower_recommender_model_tpu.train.step import make_multi_step

    train_step = make_multi_step(
        lambda s, pb: core(s, unpack_batch(pb, mcfg, pack_label=True))
    )

    n_macros = 14

    def macro_stream():
        for i in range(n_macros):
            sel = [host_batches[(5 * i + j) % n_payload_batches] for j in range(MACRO)]
            yield stack_batches(sel)

    times = []
    n = 0
    tprev = None
    for mb in prefetch_to_device(macro_stream(), lambda x: x, prefetch=3):
        state2, out = train_step(state2, mb)
        n += 1
        if n % 2 == 0:
            float(jax.block_until_ready(out["loss"]).mean())
            now = time.perf_counter()
            if tprev is not None and n > 4:
                times.append((now - tprev) / 2)
            tprev = now
    loop_ms = sorted(times)[len(times) // 2] * 1e3
    print(json.dumps({"bench_loop_macro_ms": round(loop_ms, 1),
                      "bench_loop_eps": round(MACRO * BS / (loop_ms / 1e3), 0)}),
          flush=True)


if __name__ == "__main__":
    main()
