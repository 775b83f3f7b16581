"""Per-phase budget of the device train step (VERDICT r2 item 2).

Itemizes the flagship-shape step (bs=262k, two 128-dim tables, [128,64]
towers) against the modeled HBM/MXU floors by timing ABLATED step variants
with the (2K-K)-dispatch-difference harness (constant dispatch overheads
cancel; accurate through tunnel congestion, DESIGN §5b) and differencing:

  full            the real step (same building blocks as train/step.py)
  no_user_upd     user-table update skipped       -> user update = full - this
  no_item_upd     item-table update skipped       -> item update = full - this
  no_updates      both sparse updates skipped (dense Adam kept)
  fwd_only        gathers + towers forward + loss, no grad, no updates
  gathers_only    gathers + trivial reduce (no towers)
  empty           unpack + trivial reduce of ids  -> decode/scan overhead

Derived phases:
  user_update  = full - no_user_upd        item_update = full - no_item_upd
  towers_bwd   = no_updates - fwd_only     towers_fwd+loss = fwd_only - gathers_only
  gathers      = gathers_only - empty      decode = empty

Run on the real chip (wire-tolerant; pool uploads ~13MB once per variant):
  nohup python tools/bench_phase.py > /tmp/bench_phase.log 2>&1 &
Options: --bs N  --variants spec1,spec2  (bench.py's '+' tag grammar:
  float32+sorted+blockkernel | float32+sorted+blockkernel-bf16+bf16compute)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
from two_tower_recommender_model_tpu.models import losses as losses_lib
from two_tower_recommender_model_tpu.models import two_tower
from two_tower_recommender_model_tpu.train import optimizer as opt_lib
from two_tower_recommender_model_tpu.train.step import (
    TrainState,
    _table_flat_grads,
    create_train_state,
)

N_USERS, N_ITEMS = 206_209, 49_688  # --users/--items override (CPU smoke)
POOL = 4
K = 32  # --k overrides
DEVICE_POOL = False  # --device-pool: generate pools on device (no H2D)
_POOL_CACHE: dict = {}  # (sort, batch_size) -> device pool, shared by modes


def make_ablated_step(mcfg, tcfg, dense_opt, mode: str):
    """The train step with phases removed. `mode`: full | no_user_upd |
    no_item_upd | no_updates | fwd_only | gathers_only | empty. Routing is
    the PRODUCTION routing (`train.step.pick_table_update_fn`, shared with
    make_train_step — covers f32, bf16-operand, and int8 variants), so
    `full` matches the production step; ablations keep data deps alive
    (every variant returns a loss-like scalar reduced from the live
    computation)."""
    from two_tower_recommender_model_tpu.train.step import validate_sorted_feature

    loss_fn = losses_lib.loss_fn_from_config(tcfg, mcfg)
    bs_kernel = tcfg.block_sorted_kernel
    sorted_table = validate_sorted_feature(mcfg, tcfg)
    import dataclasses as _dc

    def step(state: TrainState, batch):
        if mode == "empty":
            # decode cost only: touch the unpacked ids, no gathers
            tot = jnp.float32(0.0)
            for fc in mcfg.features:
                tot += batch.features[fc.name].ids.sum().astype(jnp.float32)
            return state, {"loss": tot}

        ds_feats = ()
        if bs_kernel != "off" and tcfg.device_sorted_gather:
            ds_feats = ("product_id",)
        gather_cfg = mcfg
        if mode in ("gather_user", "gather_item"):
            # single-feature gather: production per-feature path, towers unused
            want = "user_id" if mode == "gather_user" else "product_id"
            gather_cfg = _dc.replace(
                mcfg, features=tuple(f for f in mcfg.features if f.name == want)
            )
        pooled = two_tower.pooled_embeddings(
            state.tables, batch, gather_cfg,
            block_sorted_feature=(
                tcfg.sorted_feature
                if bs_kernel != "off" and tcfg.block_sorted_gather
                else None
            ),
            block_sorted_dtype=bs_kernel if bs_kernel != "off" else "float32",
            device_sorted_features=ds_feats,
        )
        if mode in ("gathers_only", "gather_user", "gather_item"):
            # CONSUMER CLASS MATTERS: XLA picks a slow gather emitter when
            # the gathered rows feed a plain reduction (~2.8 ms at
            # [49688,128] f32) but a fast one when they feed a matmul
            # (0.64 ms, tools/probe_fusion.py) — and the production consumer
            # IS a matmul (the tower's first layer: [B,128] @ [128,128] in
            # the variant's compute dtype). A [D, 8] consumer is NOT enough:
            # its 8 output lanes (< the 128-lane tile) re-trigger the slow
            # emitter for f32 (measured gathers_only 4.50 > fwd_only 2.57 —
            # impossible unless the consumer class differs from the towers).
            # Use the production-shaped [D, 128] matmul in the tower compute
            # dtype (0.04 ms MXU at bs=262k — negligible vs the gather).
            tot = jnp.float32(0.0)
            cdt = jnp.bfloat16 if mcfg.compute_dtype == "bfloat16" else jnp.float32
            for p in pooled.values():
                w = jnp.full((p.shape[1], 128), 1e-3, cdt)
                tot += (p.astype(cdt) @ w).sum().astype(jnp.float32)
            return state, {"loss": tot}

        def loss_of(dense_params, pooled):
            q, c = two_tower.towers_forward(dense_params, pooled, batch.dense, mcfg)
            loss, logits = loss_fn(q, c, batch, log_q=None)
            return loss, logits

        if mode == "fwd_only":
            loss, _ = loss_of(state.dense_params, pooled)
            return state, {"loss": loss}

        (loss, logits), (d_dense, d_pooled) = jax.value_and_grad(
            loss_of, argnums=(0, 1), has_aux=True
        )(state.dense_params, pooled)

        import optax

        updates, new_opt_state = dense_opt.update(
            d_dense, state.dense_opt_state, state.dense_params
        )
        new_dense = optax.apply_updates(state.dense_params, updates)

        new_tables = dict(state.tables)
        new_acc = dict(state.adagrad_acc)
        skip = {
            "no_user_upd": {sorted_table},
            "no_item_upd": {"t_product_id"},
            "no_updates": {sorted_table, "t_product_id"},
        }.get(mode, set())
        from two_tower_recommender_model_tpu.ops.quantized import QuantizedTable
        from two_tower_recommender_model_tpu.train.step import pick_table_update_fn

        for tname, (fids, fgrads) in _table_flat_grads(mcfg, batch, d_pooled).items():
            if tname in skip:
                # keep d_pooled live without the update's cost
                loss = loss + 0.0 * fgrads[0, 0]
                continue
            upd = pick_table_update_fn(
                mcfg, tcfg, sorted_table, tname, fids.shape[0],
                isinstance(state.tables[tname], QuantizedTable),
            )
            new_tables[tname], new_acc[tname] = upd(
                state.tables[tname], state.adagrad_acc[tname], fids, fgrads,
                tcfg.sparse_learning_rate, tcfg.adagrad_eps,
            )
        new_state = _dc.replace(
            state, step=state.step + 1, tables=new_tables, adagrad_acc=new_acc,
            dense_params=new_dense, dense_opt_state=new_opt_state,
        )
        return new_state, {"loss": loss}

    return step


def build(variant: str, batch_size: int, mode: str):
    from bench import parse_variant, variant_compute_dtype

    _dtype, sort, _bf16buf, _compact, bsk, _delta = parse_variant(variant)
    mcfg = cfg_lib.two_tower_model_config(
        num_users=N_USERS, num_items=N_ITEMS, embedding_dim=128,
        layer_sizes=(128, 64), compute_dtype=variant_compute_dtype(variant),
    )
    if _dtype != "float32":
        import dataclasses as _dc

        mcfg = _dc.replace(mcfg, table_dtype=_dtype)
    tcfg = cfg_lib.TrainConfig(
        batch_size=batch_size,
        sorted_feature="user_id" if sort else None,
        block_sorted_kernel=bsk,
        device_sorted_gather="dsgather" in variant.split("+")[1:],
        block_sorted_gather="xlagather" not in variant.split("+")[1:],
    )
    cache_key = (bool(sort), batch_size)
    if cache_key in _POOL_CACHE:
        pool = _POOL_CACHE[cache_key]
    elif DEVICE_POOL:
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
        pool = jnp.asarray(pool_np)
    _POOL_CACHE[cache_key] = pool

    state, dense_opt = create_train_state(jax.random.key(0), mcfg, tcfg)
    core = make_ablated_step(mcfg, tcfg, dense_opt, mode)

    def run_k(k):
        @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
        def run(state, pool, k):
            def body(carry, i):
                pb_ids = jax.lax.dynamic_index_in_dim(pool, i % POOL, keepdims=False)
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


def time_mode(variant: str, batch_size: int, mode: str, reps: int = 5) -> float:
    state, pool, run_k = build(variant, batch_size, mode)
    r1, r2 = run_k(K), run_k(2 * K)
    state, v = r1(state, pool, K)
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
        diffs.append((t2 - t1) - (t1 - t0))
    diffs.sort()
    return diffs[len(diffs) // 2] / K * 1e3  # ms/step


MODES = ("full", "no_user_upd", "no_item_upd", "no_updates", "fwd_only",
         "gathers_only", "gather_user", "gather_item", "empty")


def floors(batch_size: int, table_dtype: str = "float32") -> dict:
    """Modeled per-phase floors (ms) at flagship shapes on v5e: HBM 819 GB/s,
    MXU ~197 bf16 TFLOP/s. Streaming bytes only (no latency model).
    int8 tables stream 1 B/elem + 4 B/row scales (+4 B/row again on the
    update write-back, scales are rewritten)."""
    d, hbm, mxu = 128, 819e9, 197e12
    b = batch_size
    elem = 1 if table_dtype == "int8" else 4
    per_row_extra = 4 if table_dtype == "int8" else 0
    user_tab = N_USERS * (d * elem + per_row_extra)
    item_tab = N_ITEMS * (d * elem + per_row_extra)
    rows_out = b * d * 4
    return {
        "gathers_hbm_ms": (user_tab + item_tab + 2 * rows_out) / hbm * 1e3,
        "updates_hbm_ms": 2 * (user_tab + item_tab) / hbm * 1e3 + 2 * rows_out / hbm * 1e3,
        "towers_mxu_ms": (6 * b * (2 * d * 128 + 128 * 64)) / mxu * 1e3,
        "towers_hbm_ms": (b * d * 4 * 6) / hbm * 1e3,
        "decode_hbm_ms": (b * 3 * 4 * 2) / hbm * 1e3,
    }


def main():
    global K, N_USERS, N_ITEMS, DEVICE_POOL
    if "--device-pool" in sys.argv:
        DEVICE_POOL = True
    if "--k" in sys.argv:
        K = int(sys.argv[sys.argv.index("--k") + 1])
    if "--users" in sys.argv:
        N_USERS = int(sys.argv[sys.argv.index("--users") + 1])
    if "--items" in sys.argv:
        N_ITEMS = int(sys.argv[sys.argv.index("--items") + 1])
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    variants = ("float32+sorted+blockkernel",
                "float32+sorted+blockkernel-bf16+bf16compute")
    if "--variants" in sys.argv:
        variants = tuple(sys.argv[sys.argv.index("--variants") + 1].split(","))
    bs = 262_144
    if "--bs" in sys.argv:
        bs = int(sys.argv[sys.argv.index("--bs") + 1])
    modes = MODES
    if "--modes" in sys.argv:  # targeted re-measures (phase diffs undefined)
        modes = tuple(sys.argv[sys.argv.index("--modes") + 1].split(","))
    out = {"batch_size": bs, "floors_ms": floors(bs), "variants": {}}
    for variant in variants:
        from bench import parse_variant as _pv

        vfloors = floors(bs, _pv(variant)[0])
        t = {}
        for mode in modes:
            t[mode] = round(time_mode(variant, bs, mode), 3)
            print(json.dumps({"variant": variant, "mode": mode, "ms": t[mode]}),
                  flush=True)
        phases = {}
        if modes == MODES:
            phases = {
                "user_update": round(t["full"] - t["no_user_upd"], 3),
                "item_update": round(t["full"] - t["no_item_upd"], 3),
                "both_updates": round(t["full"] - t["no_updates"], 3),
                "towers_bwd_dense_opt": round(t["no_updates"] - t["fwd_only"], 3),
                "towers_fwd_loss": round(t["fwd_only"] - t["gathers_only"], 3),
                "gathers": round(t["gathers_only"] - t["empty"], 3),
                "gather_user": round(t["gather_user"] - t["empty"], 3),
                "gather_item": round(t["gather_item"] - t["empty"], 3),
                "decode_scan": round(t["empty"], 3),
            }
            print(json.dumps({"variant": variant, "phases_ms": phases}),
                  flush=True)
        out["variants"][variant] = {
            "raw_ms": t, "phases_ms": phases, "floors_ms": vfloors,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
