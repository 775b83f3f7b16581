"""Oracle tests for the fused flash-style sampled-softmax kernels
(interpret mode): forward (lse, pos) and custom-VJP grads vs the scan-path
oracle, across the mask surface (accidental-hit ids, logQ, pad columns),
plus the rectangular sharded form (local q stripe vs all candidates).

Inputs are pre-rounded to bf16 values so the kernel's single-pass bf16
matmuls and the oracle's f32 matmuls see identical products; remaining
diffs are f32 summation order (online-logsumexp rescaling)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from two_tower_recommender_model_tpu.models.losses import (
    in_batch_sampled_softmax,
)
from two_tower_recommender_model_tpu.ops.softmax_kernel import (
    lse_and_pos,
    sampled_softmax_fused,
    sampled_softmax_fused_parts,
    softmax_kernel_shapes_ok,
)

B, D = 512, 128


def _setup(seed=0, dup=True, d=D):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, d)).astype(np.float32)
    c = rng.normal(size=(B, d)).astype(np.float32)
    # bf16-round so kernel (bf16 single-pass) and oracle (f32) products match
    q = np.asarray(jnp.asarray(q).astype(jnp.bfloat16).astype(jnp.float32))
    c = np.asarray(jnp.asarray(c).astype(jnp.bfloat16).astype(jnp.float32))
    labels = rng.integers(0, 2, B).astype(np.int32)
    ids = rng.integers(1, 40 if dup else 10**6, B).astype(np.int32)  # duplicates
    log_q = rng.normal(size=B).astype(np.float32) * 0.1
    return q, c, labels, ids, log_q


def _dense_oracle(q, c, ids, log_q, temperature, n_valid, use_ids, use_logq):
    s = (q @ c.T) / temperature
    if use_logq:
        s = s - log_q[None, :]
    cols = np.arange(B)
    eye = cols[:, None] == cols[None, :]
    if n_valid is not None:
        s = np.where(cols[None, :] >= n_valid, -1e9, s)
    if use_ids:
        dup = ids[None, :] == ids[:, None]
        s = np.where(dup & ~eye, -1e9, s)
    m = s.max(axis=1)
    lse = m + np.log(np.exp(s - m[:, None]).sum(axis=1))
    pos = np.diagonal(s)
    return lse, pos


@pytest.mark.parametrize("use_ids,use_logq,n_valid", [
    (False, False, None),
    (True, False, None),
    (True, True, None),
    (True, True, 400),
])
def test_lse_pos_forward_oracle(use_ids, use_logq, n_valid):
    q, c, labels, ids, log_q = _setup()
    ids_f = jnp.asarray(ids, jnp.int32).astype(jnp.float32)
    rows_f = jnp.arange(B, dtype=jnp.float32)
    lse, pos = lse_and_pos(
        jnp.asarray(q), jnp.asarray(c), ids_f, ids_f,
        jnp.asarray(log_q), rows_f, 0.7, n_valid, (use_ids, use_logq), True,
    )
    exp_lse, exp_pos = _dense_oracle(q, c, ids, log_q, 0.7, n_valid,
                                     use_ids, use_logq)
    np.testing.assert_allclose(np.asarray(lse), exp_lse, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pos), exp_pos, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("use_ids,use_logq,n_valid", [
    (False, False, None),
    (True, True, None),
    (True, True, 384),
])
def test_fused_loss_and_grads_match_scan_path(use_ids, use_logq, n_valid):
    """sampled_softmax_fused's value AND (dq, dc) == the scan-path loss under
    jax.grad on the same inputs (f32-summation-order tolerance)."""
    q, c, labels, ids, log_q = _setup(seed=3)
    ids_a = jnp.asarray(ids, jnp.int32) if use_ids else None
    lq_a = jnp.asarray(log_q) if use_logq else None
    lab = jnp.asarray(labels)
    if n_valid is not None:
        lab = lab * (jnp.arange(B) < n_valid)

    def fused(q, c):
        return sampled_softmax_fused(q, c, lab, ids_a, lq_a, 0.9,
                                     n_valid=n_valid, interpret=True)

    def scan(q, c):
        # the library scan path; force the chunked implementation
        from two_tower_recommender_model_tpu.models.losses import (
            _chunked_sampled_softmax,
        )

        return _chunked_sampled_softmax(q, c, lab, ids_a, lq_a, 0.9, 128,
                                        n_valid=n_valid)

    qa, ca = jnp.asarray(q), jnp.asarray(c)
    lf, (dqf, dcf) = jax.value_and_grad(fused, argnums=(0, 1))(qa, ca)
    ls, (dqs, dcs) = jax.value_and_grad(scan, argnums=(0, 1))(qa, ca)
    np.testing.assert_allclose(float(lf), float(ls), rtol=1e-5)
    # The backward recompute dots round the probability operand to bf16 —
    # the SAME numerics class as XLA's Precision.DEFAULT matmuls on TPU
    # (where the scan path's backward also runs bf16-operand); the CPU scan
    # oracle here computes f32 products, so the contract is bf16-operand
    # tolerance plus near-perfect direction.
    for got, exp in ((dqf, dqs), (dcf, dcs)):
        g, e = np.asarray(got), np.asarray(exp)
        np.testing.assert_allclose(g, e, atol=2e-4, rtol=2e-2)
        cos = (g * e).sum() / (np.linalg.norm(g) * np.linalg.norm(e))
        assert cos > 0.99999, cos


def test_fused_pads_unaligned_dim():
    """d=64 — the PRODUCTION tower output width (layer_sizes=(128, 64)) — is
    zero-padded to the 128-lane tile inside the wrapper: loss and grads match
    the scan path exactly as in the aligned case."""
    q, c, labels, ids, log_q = _setup(seed=7, d=64)
    lab = jnp.asarray(labels)
    ids_a = jnp.asarray(ids, jnp.int32)
    lq_a = jnp.asarray(log_q)

    def fused(q, c):
        return sampled_softmax_fused(q, c, lab, ids_a, lq_a, 0.9,
                                     interpret=True)

    def scan(q, c):
        from two_tower_recommender_model_tpu.models.losses import (
            _chunked_sampled_softmax,
        )

        return _chunked_sampled_softmax(q, c, lab, ids_a, lq_a, 0.9, 128)

    qa, ca = jnp.asarray(q), jnp.asarray(c)
    lf, (dqf, dcf) = jax.value_and_grad(fused, argnums=(0, 1))(qa, ca)
    ls, (dqs, dcs) = jax.value_and_grad(scan, argnums=(0, 1))(qa, ca)
    np.testing.assert_allclose(float(lf), float(ls), rtol=1e-5)
    assert dqf.shape == (B, 64) and dcf.shape == (B, 64)
    for got, exp in ((dqf, dqs), (dcf, dcs)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   atol=2e-4, rtol=2e-2)


@pytest.mark.parametrize("use_ids,use_logq", [(False, False), (True, True)])
def test_rectangular_stripes_sum_to_square(use_ids, use_logq):
    """The sharded decomposition: 4 disjoint [B/4, B] row stripes with
    row_offset (the shard_map layout) — their (num, den) partials sum to the
    square-case loss, and per-stripe dq rows + summed dc equal the square
    grads (value and VJP of the data-parallel split)."""
    q, c, labels, ids, log_q = _setup(seed=11)
    qa, ca, lab = jnp.asarray(q), jnp.asarray(c), jnp.asarray(labels)
    ids_a = jnp.asarray(ids, jnp.int32) if use_ids else None
    lq_a = jnp.asarray(log_q) if use_logq else None

    def square(q, c):
        num, den = sampled_softmax_fused_parts(
            q, c, lab, ids_a, None, lq_a, 0.8, interpret=True)
        return num / jnp.maximum(den, 1.0)

    nshards, bl = 4, B // 4

    def striped(q, c):
        nums, dens = [], []
        for s in range(nshards):
            sl = slice(s * bl, (s + 1) * bl)
            num, den = sampled_softmax_fused_parts(
                q[sl], c, lab[sl],
                row_item_ids=None if ids_a is None else ids_a[sl],
                col_item_ids=ids_a,
                log_q=lq_a, temperature=0.8, row_offset=s * bl,
                interpret=True)
            nums.append(num)
            dens.append(den)
        return sum(nums) / jnp.maximum(sum(dens), 1.0)

    lsq, (dq_sq, dc_sq) = jax.value_and_grad(square, argnums=(0, 1))(qa, ca)
    lst, (dq_st, dc_st) = jax.value_and_grad(striped, argnums=(0, 1))(qa, ca)
    np.testing.assert_allclose(float(lsq), float(lst), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dq_st), np.asarray(dq_sq),
                               atol=1e-6, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dc_st), np.asarray(dc_sq),
                               atol=1e-6, rtol=1e-4)


def test_sharded_shard_map_matches_scan():
    """`sharded_in_batch_sampled_softmax` (fused kernel under shard_map on the
    8-device CPU mesh) == the single-device scan path: loss value and (dq, dc)
    — the multi-chip route for the north-star loss."""
    from two_tower_recommender_model_tpu.models.losses import (
        sharded_in_batch_sampled_softmax,
    )
    from two_tower_recommender_model_tpu.parallel.mesh import make_mesh

    cpu_mesh = make_mesh(8, 1)

    # b=1024 so b_local=128 clears the kernel's bq tile gate (b=512 would
    # silently exercise the scan fallback instead of the kernel)
    rng = np.random.default_rng(13)
    b = 1024
    q = np.asarray(jnp.asarray(rng.normal(size=(b, 64)).astype(np.float32))
                   .astype(jnp.bfloat16).astype(jnp.float32))
    c = np.asarray(jnp.asarray(rng.normal(size=(b, 64)).astype(np.float32))
                   .astype(jnp.bfloat16).astype(jnp.float32))
    qa, ca = jnp.asarray(q), jnp.asarray(c)
    lab = jnp.asarray(rng.integers(0, 2, b).astype(np.int32))
    ids_a = jnp.asarray(rng.integers(1, 40, b).astype(np.int32))
    lq_a = jnp.asarray((rng.normal(size=b) * 0.1).astype(np.float32))

    # guard: this size must actually engage the kernel, not the fallback
    from two_tower_recommender_model_tpu.models.losses import _use_fused_softmax

    assert _use_fused_softmax(b, 64, "on", b // 8)

    def sharded(q, c):
        return sharded_in_batch_sampled_softmax(
            cpu_mesh, q, c, lab, ids_a, lq_a, temperature=0.9,
            implementation="on")

    def single(q, c):
        return in_batch_sampled_softmax(q, c, lab, ids_a, lq_a,
                                        temperature=0.9, implementation="off")

    lsh, (dq_sh, dc_sh) = jax.jit(
        jax.value_and_grad(sharded, argnums=(0, 1)))(qa, ca)
    lsi, (dq_si, dc_si) = jax.value_and_grad(single, argnums=(0, 1))(qa, ca)
    np.testing.assert_allclose(float(lsh), float(lsi), rtol=1e-5)
    for got, exp in ((dq_sh, dq_si), (dc_sh, dc_si)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   atol=2e-4, rtol=2e-2)


def test_sharded_small_batch_falls_back_to_scan():
    """Batches the kernel can't tile (B_local < 128) take the GSPMD scan path
    inside `sharded_in_batch_sampled_softmax` — same value as single-device."""
    from two_tower_recommender_model_tpu.models.losses import (
        sharded_in_batch_sampled_softmax,
    )
    from two_tower_recommender_model_tpu.parallel.mesh import make_mesh

    cpu_mesh = make_mesh(8, 1)

    rng = np.random.default_rng(17)
    b = 64  # b_local = 8 on the 8-device mesh: below the kernel's tile
    q = jnp.asarray(rng.normal(size=(b, 64)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(b, 64)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 2, b).astype(np.int32))
    got = sharded_in_batch_sampled_softmax(cpu_mesh, q, c, lab,
                                           implementation="auto")
    exp = in_batch_sampled_softmax(q, c, lab, implementation="off")
    np.testing.assert_allclose(float(got), float(exp), rtol=1e-6)


def test_in_batch_routes_to_kernel_when_forced(monkeypatch):
    """implementation='on' routes through the fused kernel off-TPU
    (interpret), matching the default scan result."""
    q, c, labels, ids, log_q = _setup(seed=5)
    qa, ca = jnp.asarray(q), jnp.asarray(c)
    lab = jnp.asarray(labels)
    on = in_batch_sampled_softmax(qa, ca, lab, jnp.asarray(ids),
                                  jnp.asarray(log_q), implementation="on")
    off = in_batch_sampled_softmax(qa, ca, lab, jnp.asarray(ids),
                                   jnp.asarray(log_q), implementation="off")
    np.testing.assert_allclose(float(on), float(off), rtol=1e-5)


def test_shapes_gate():
    assert softmax_kernel_shapes_ok(65536, 128)
    assert softmax_kernel_shapes_ok(65536, 64)        # padded to 128 lanes
    assert not softmax_kernel_shapes_ok(65536, 4096)  # d cap
    assert not softmax_kernel_shapes_ok(1000, 128)    # bk % 128
    assert not softmax_kernel_shapes_ok(128, 128)     # too small
    assert softmax_kernel_shapes_ok(65536, 64, bq=8192)    # sharded stripe
    assert not softmax_kernel_shapes_ok(65536, 64, bq=96)  # bq % 128
    assert not softmax_kernel_shapes_ok(512, 64, bq=384)   # bk % bq


def test_auto_routing_measured_defaults():
    """Round-4 measured routing (DESIGN §6c-r3): single-device "auto" is
    batch-dependent — kernel for 4096 < b <= 8192 (wins 3.22 vs 3.45 ms
    at the production bs=8192), scan above (scan wins 16k/32k/64k); the
    fused kernel always engages for the shard_map stripe route (b_local
    set); "on" forces it anywhere; "off" never."""
    from two_tower_recommender_model_tpu.models.losses import _use_fused_softmax

    backend_is_tpu = __import__("jax").default_backend() == "tpu"
    # single-device auto: scan path at large batches...
    assert not _use_fused_softmax(65536, 64, "auto")
    assert not _use_fused_softmax(16384, 64, "auto")
    # ...kernel at the production mid-size batch (TPU only; interpret is slow)
    assert _use_fused_softmax(8192, 64, "auto") == backend_is_tpu
    # small batches: dense path, never the kernel
    assert not _use_fused_softmax(4096, 64, "auto")
    # sharded auto: kernel on TPU (scan on CPU test runs — interpret is slow)
    assert _use_fused_softmax(65536, 64, "auto", 8192) == backend_is_tpu
    # forced
    assert _use_fused_softmax(65536, 64, "on")
    assert not _use_fused_softmax(65536, 64, "off", 8192)
    # shape gates still apply under "on"
    assert not _use_fused_softmax(65537, 64, "on")


def test_fused_pos_consistency_large_scores():
    """ADVICE r4: the positive score is f32 outside the kernel while its
    in-lse contribution is bf16-rounded, so per-row (lse - pos) can go
    slightly negative when the positive dominates. Bound the consequence at
    LARGE score magnitudes: (a) on a worst-case batch (q == c_pos rows, so
    pos is the row max and lse ~= pos) the fused loss stays >= the -1e-3
    rounding floor instead of drifting negative, and (b) fused-vs-scan loss
    gap stays in the bf16-operand class as scores grow (|scores| up to
    ~100)."""
    rng = np.random.default_rng(11)
    for scale in (1.0, 4.0, 10.0):
        base = rng.normal(size=(B, D)).astype(np.float32) * scale / np.sqrt(D)
        q = jnp.asarray(base)
        c = jnp.asarray(base + 0.01 * rng.normal(size=(B, D)).astype(np.float32))
        lab = jnp.ones((B,), jnp.float32)
        lf = sampled_softmax_fused(q, c, lab, None, None, 1.0, interpret=True)
        from two_tower_recommender_model_tpu.models.losses import (
            _chunked_sampled_softmax,
        )

        ls = _chunked_sampled_softmax(q, c, lab, None, None, 1.0, 128)
        # the loss is a mean of (lse - pos) >= 0 terms up to bf16 rounding of
        # the lse operands; it must not drift negative...
        assert float(lf) > -1e-3, (scale, float(lf))
        # ...and must track the scan loss at bf16-operand tolerance even
        # when scores reach |~scale^2| magnitudes
        assert abs(float(lf) - float(ls)) <= 2e-2 * (1.0 + abs(float(ls))), (
            scale, float(lf), float(ls))
