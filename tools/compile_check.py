"""AOT Mosaic/TPU compile check for every Pallas kernel surface.

The CPU test suite runs the kernels in INTERPRET mode, which accepts ops the
real Mosaic lowering rejects (round-4 example: a float32 `broadcasted_iota`
— `tpu.iota` is integer-only — passed 19 CPU tests, then failed the first
on-chip step). This tool `jit(...).lower(...).compile()`s each kernel-using
program against the REAL TPU backend: compiles are RPCs, so it works even
while the tunnel wire is congested, and it finishes in ~1-2 min.

Run:  python tools/compile_check.py            # all surfaces
      python tools/compile_check.py softmax    # one surface
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def check_softmax():
    """Fused sampled-softmax fwd+bwd: square (single-device) and rectangular
    (shard_map stripe) forms, with ids + logQ masks on."""
    from two_tower_recommender_model_tpu.ops.softmax_kernel import (
        sampled_softmax_fused,
        sampled_softmax_fused_parts,
    )

    b, d = 65536, 128
    q = jnp.zeros((b, d), jnp.float32)
    c = jnp.zeros((b, d), jnp.float32)
    labels = jnp.ones((b,), jnp.float32)
    ids = jnp.arange(b, dtype=jnp.int32)
    lq = jnp.zeros((b,), jnp.float32)

    def loss_sq(q, c):
        return sampled_softmax_fused(q, c, labels, ids, lq, 0.7)

    jax.jit(jax.value_and_grad(loss_sq, argnums=(0, 1))).lower(q, c).compile()

    bq = b // 8
    ql = jnp.zeros((bq, d), jnp.float32)

    def loss_rect(ql, c):
        num, den = sampled_softmax_fused_parts(
            ql, c, labels[:bq], row_item_ids=ids[:bq], col_item_ids=ids,
            log_q=lq, temperature=0.7, row_offset=3 * bq)
        return num / den

    jax.jit(jax.value_and_grad(loss_rect, argnums=(0, 1))).lower(ql, c).compile()


def check_block_sorted():
    """Block-sorted one-hot MXU kernels (f32 + int8 forms) at flagship
    shapes through the train step they route in."""
    from two_tower_recommender_model_tpu.ops.block_sorted import (
        block_sorted_lookup,
        block_sorted_lookup_quantized,
        block_sorted_rowwise_adagrad_fused,
        block_sorted_rowwise_adagrad_fused_quantized,
    )

    n, d, m = 49688, 128, 262144
    table = jnp.zeros((n, d), jnp.float32)
    ids = jnp.zeros((m,), jnp.int32)
    grads = jnp.zeros((m, d), jnp.float32)
    acc = jnp.zeros((n,), jnp.float32)
    jax.jit(lambda t, i: block_sorted_lookup(t, i)).lower(table, ids).compile()
    jax.jit(
        lambda v, s, i: block_sorted_lookup_quantized(v, s, i)
    ).lower(jnp.zeros((n, d), jnp.int8), jnp.ones((n,), jnp.float32),
            ids).compile()
    jax.jit(
        lambda t, a, i, g: block_sorted_rowwise_adagrad_fused(t, a, i, g, 0.05)
    ).lower(table, acc, ids, grads).compile()
    jax.jit(
        lambda v, s, a, i, g: block_sorted_rowwise_adagrad_fused_quantized(
            v, s, a, i, g, 0.05)
    ).lower(jnp.zeros((n, d), jnp.int8), jnp.ones((n,), jnp.float32),
            acc, ids, grads).compile()
    # bf16 matmul_dtype: grads stream from HBM as bf16 (round-4 grad-wire
    # change) — distinct Mosaic input layouts from the f32 forms above
    from two_tower_recommender_model_tpu.train.optimizer import (
        device_sorted_fused_adagrad,
    )

    jax.jit(
        lambda t, a, i, g: block_sorted_rowwise_adagrad_fused(
            t, a, i, g, 0.05, matmul_dtype="bfloat16")
    ).lower(table, acc, ids, grads).compile()
    jax.jit(
        lambda t, i: block_sorted_lookup(
            t, i, matmul_dtype="bfloat16", out_dtype=jnp.bfloat16)
    ).lower(table, ids).compile()
    jax.jit(
        lambda t, a, i, g: device_sorted_fused_adagrad(
            t, a, i, g, 0.05, matmul_dtype="bfloat16")
    ).lower(table, acc, ids, grads).compile()


def check_quantized():
    """Packed int8 rows+scales gather + quantized row-wise Adagrad."""
    from two_tower_recommender_model_tpu.ops.quantized import (
        QuantizedTable,
        gather_int8_rows_scales,
        quantized_rowwise_adagrad,
    )

    n, d, m = 49688, 128, 262144
    qt = QuantizedTable(values=jnp.zeros((n, d), jnp.int8),
                        scales=jnp.ones((n,), jnp.float32))
    ids = jnp.zeros((m,), jnp.int32)
    grads = jnp.zeros((m, d), jnp.float32)
    acc = jnp.zeros((n,), jnp.float32)
    jax.jit(gather_int8_rows_scales).lower(qt.values, qt.scales, ids).compile()
    jax.jit(
        lambda qt, a, i, g: quantized_rowwise_adagrad(qt, a, i, g, 0.05)
    ).lower(qt, acc, ids, grads).compile()


def check_train_step_softmax():
    """The FULL production train step with loss="sampled_softmax" and the
    fused kernel forced on — the exact program bench.py's softmax row runs
    (this is the composition that caught the round-4 iota bug)."""
    from two_tower_recommender_model_tpu import config as cfg_lib
    from two_tower_recommender_model_tpu.data.device_featurizer import (
        PackedBatch,
        PackedFeaturizer,
        unpack_batch,
    )
    from two_tower_recommender_model_tpu.train.step import (
        create_train_state,
        make_train_step,
    )

    bs = 65536
    mcfg = cfg_lib.two_tower_model_config(
        num_users=206_209, num_items=49_688, embedding_dim=128,
        layer_sizes=(128, 64))
    tcfg = cfg_lib.TrainConfig(
        batch_size=bs, sorted_feature="user_id",
        block_sorted_kernel="float32", loss="sampled_softmax",
        softmax_kernel="on")
    state, dense_opt = create_train_state(jax.random.key(0), mcfg, tcfg)
    core = make_train_step(mcfg, tcfg, dense_opt, donate=False, jit=False)
    feat = PackedFeaturizer(mcfg, pack_label=True, sort_feature="user_id")
    slots = feat(
        {k: np.ones(bs, np.int64) for k in ("user_id", "product_id")}
        | {"label": np.ones(bs, np.int64)}
    ).ids_raw.shape[1]

    def step(state, ids_raw):
        pb = PackedBatch(ids_raw=ids_raw, labels=jnp.zeros(0, jnp.int32))
        return core(state, unpack_batch(pb, mcfg, pack_label=True))

    jax.jit(step).lower(
        state, jax.ShapeDtypeStruct((bs, slots), jnp.int32)).compile()


def check_tower_bwd():
    """The fused 2-layer tower backward (custom VJP, ops/tower_bwd.py) as
    the production bf16 train step engages it (fused_tower_backward auto ->
    ON under bf16 compute on TPU) — caught the r5 bf16-comparison lowering
    bug the interpret tests could not."""
    from two_tower_recommender_model_tpu.models.mlp import apply_mlp, init_mlp

    b = 262_144
    params = init_mlp(jax.random.key(0), 128, (128, 64))
    x = jnp.zeros((b, 128), jnp.bfloat16)

    def loss(p, x):
        out = apply_mlp(p, x, "relu", True, jnp.bfloat16, fused_backward=True)
        return jnp.sum(out.astype(jnp.float32))

    jax.jit(jax.value_and_grad(loss, argnums=(0, 1))).lower(params, x).compile()


CHECKS = {
    "softmax": check_softmax,
    "block_sorted": check_block_sorted,
    "quantized": check_quantized,
    "train_step_softmax": check_train_step_softmax,
    "tower_bwd": check_tower_bwd,
}


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or list(CHECKS)
    assert jax.default_backend() == "tpu", (
        f"needs the real TPU backend (got {jax.default_backend()}); "
        "Mosaic lowering does not run on CPU")
    failed = []
    for name in names:
        t0 = time.time()
        try:
            CHECKS[name]()
            print(f"OK   {name} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — report every surface
            failed.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
    if failed:
        sys.exit(f"FAILED: {', '.join(failed)}")
    print("all kernel surfaces compile for Mosaic/TPU")


if __name__ == "__main__":
    main()
