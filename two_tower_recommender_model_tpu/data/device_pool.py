"""On-device batch-pool generation for device-resident benchmarks.

The (2K-K)-dispatch-difference harnesses (`tools/bench_step_device.py`,
`tools/bench_phase.py`, `bench.py`'s device_step) stage a pool of real
PackedBatches over the wire once per build. On this rig the tunnel's H2D
path has hours-long NEAR-DEAD episodes (CLAUDE.md; 0.0-0.1 MB/s vs ~1400
healthy) during which even that one-time ~17 MB staging takes longer than
the measurement itself. This module removes the wire from the picture:
the pool is generated ON DEVICE by a jitted `jax.random` program, so the
only bytes that cross the tunnel are the compiled program and scalar
seeds/fetches.

Distribution fidelity: the flagship bench feeds `SyntheticClickstream`
(uniform user ids in [1, U], items a ~uniform mixture of argmax-of-8
positives and uniform negatives; no popularity skew at the bench's
`seed=0` default). For step-time purposes the perf-relevant properties
are the id *marginals* (uniform -> the same within-batch duplicate rate
that drives gather/update locality), the missing-id rate (zero), and row
ordering (sorted variants sort by the slot-0 hashed key). All three are
reproduced exactly; tests assert the layout invariants against
`PackedFeaturizer`'s contract (`tests/test_device_pool.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from two_tower_recommender_model_tpu.config import ModelConfig


def _slot_layout(model_cfg: ModelConfig) -> list[tuple[int, int]]:
    """[(slot_offset, num_embeddings)] with one entry per id slot."""
    out = []
    off = 0
    for fc in model_cfg.features:
        n = model_cfg.feature_table(fc.name).num_embeddings
        for _ in range(fc.max_ids_per_sample):
            out.append((off, n))
            off += 1
    return out


def device_batch_pool(
    model_cfg: ModelConfig,
    batch_size: int,
    pool_n: int,
    *,
    pack_label: bool = True,
    sort: bool = False,
    seed: int = 0,
) -> jax.Array:
    """[P, B, S] int32 ids_raw pool, generated and resident on device.

    Matches `PackedFeaturizer(pack_label=pack_label, sort_feature=...)`'s
    output layout: raw ids uniform in [1, num_embeddings] per slot (so the
    device hash `id % N` is the identity and the missing-id mask never
    fires, as with synthetic data), binary labels packed into bit 30 of
    slot 0 when `pack_label` (label = slot-0 id parity — learnable, see
    below), rows sorted by the slot-0 hashed key when `sort`. Every pool
    entry uses a distinct fold of `seed`, so payloads (and the table rows
    they touch) differ across entries — required for the tunnel's dispatch
    dedupe (DESIGN §5b) and honest cache behavior.
    """
    slots = _slot_layout(model_cfg)
    if pack_label and slots[0][1] >= (1 << 30):
        raise ValueError("pack_label needs slot-0 table < 2^30 rows")

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def gen(key, batch_size: int, pool_n: int):
        def one(key):
            ks = jax.random.split(key, len(slots))
            cols = [
                jax.random.randint(ks[i], (batch_size,), 1, n + 1, dtype=jnp.int32)
                for i, (_, n) in enumerate(slots)
            ]
            if sort:
                # hashed key == raw id here (ids < N); missing-last doesn't
                # apply (no zeros). argsort mirrors sort_packed_batch's
                # non-decreasing slot-0 invariant.
                order = jnp.argsort(cols[0])
                cols = [c[order] for c in cols]
            if pack_label:
                # Deterministic learnable label (parity of the slot-0 id):
                # labels never affect step COST, but the harnesses' honesty
                # guard requires the chained loss to decrease, and a
                # memorizable signal makes that robust at any step count —
                # unlike replayed bernoulli noise.
                label = cols[0] & 1
                cols[0] = cols[0] | (label << 30)
            return jnp.stack(cols, axis=1)

        return jax.vmap(one)(jax.random.split(key, pool_n))

    return gen(jax.random.key(seed), batch_size, pool_n)
