"""A/B the compact wire format vs PackedBatch in the bench hot loop shape.

Run:  nohup python tools/probe_compact.py > /tmp/probe_compact.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

from two_tower_recommender_model_tpu import config as cfg_lib
from two_tower_recommender_model_tpu.data import SyntheticClickstream
from two_tower_recommender_model_tpu.data.compact import (
    CompactFeaturizer,
    CompactScheme,
    batch_from_compact,
    compact_from_packed,
)
from two_tower_recommender_model_tpu.data.device_featurizer import (
    PackedFeaturizer,
    unpack_batch,
)
from two_tower_recommender_model_tpu.train.pipeline import prefetch_to_device
from two_tower_recommender_model_tpu.train.step import (
    create_train_state,
    make_multi_step,
    make_train_step,
    stack_batches,
)

N_USERS, N_ITEMS = 206_209, 49_688
BS = 262_144
MACRO = 16
N_MACROS = 14


def run_loop(wire: str):
    mcfg = cfg_lib.two_tower_model_config(
        num_users=N_USERS, num_items=N_ITEMS, embedding_dim=128, layer_sizes=(128, 64)
    )
    tcfg = cfg_lib.TrainConfig(batch_size=BS, sorted_feature="user_id")
    pf = PackedFeaturizer(mcfg, pack_label=True, sort_feature="user_id")
    ds = SyntheticClickstream(num_users=N_USERS, num_items=N_ITEMS, seed=0)

    state, dense_opt = create_train_state(jax.random.key(0), mcfg, tcfg)
    core = make_train_step(mcfg, tcfg, dense_opt, donate=False, jit=False)

    t0 = time.perf_counter()
    host = [pf(ds.sample(BS, start=i)) for i in range(24)]
    feat_s = time.perf_counter() - t0
    if wire == "compact":
        scheme = CompactScheme.from_model(mcfg, pack_label=True)
        t0 = time.perf_counter()
        host = [compact_from_packed(pb, scheme) for pb in host]
        enc_ms = (time.perf_counter() - t0) / len(host) * 1e3
        step = make_multi_step(
            lambda s, cb: core(s, batch_from_compact(cb, mcfg, scheme)))
        payload_mb = (host[0].wire.nbytes + host[0].rem.nbytes) * MACRO / 1e6
    else:
        enc_ms = 0.0
        step = make_multi_step(
            lambda s, pb: core(s, unpack_batch(pb, mcfg, pack_label=True)))
        payload_mb = host[0].ids_raw.nbytes * MACRO / 1e6
    print(json.dumps({"wire": wire, "featurize_s": round(feat_s, 1),
                      "encode_ms_per_batch": round(enc_ms, 1),
                      "payload_mb_per_macro": round(payload_mb, 1)}),
          file=sys.stderr, flush=True)

    def macro_stream():
        for i in range(N_MACROS):
            sel = [host[(5 * i + j) % len(host)] for j in range(MACRO)]
            yield stack_batches(sel)

    times, losses = [], []
    n = 0
    tprev = None
    for mb in prefetch_to_device(macro_stream(), lambda x: x, prefetch=3):
        state, out = step(state, mb)
        n += 1
        if n % 2 == 0:
            losses.append(round(float(jax.block_until_ready(out["loss"]).mean()), 4))
            now = time.perf_counter()
            if tprev is not None and n > 4:
                times.append((now - tprev) / 2)
            tprev = now
    ms = sorted(times)[len(times) // 2] * 1e3
    return {"wire": wire, "macro_ms": round(ms, 1),
            "examples_per_sec": round(MACRO * BS / (ms / 1e3), 0),
            "losses": losses}


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    for wire in ("compact", "packed"):
        print(json.dumps(run_loop(wire)), flush=True)


if __name__ == "__main__":
    main()
