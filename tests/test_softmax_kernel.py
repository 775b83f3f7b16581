"""Oracle tests for the fused flash-style sampled-softmax kernels
(interpret mode): forward (lse, pos) and custom-VJP grads vs the scan-path
oracle, across the mask surface (accidental-hit ids, logQ, pad columns).

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
    softmax_kernel_shapes_ok,
)

B, D = 512, 128


def _setup(seed=0, dup=True):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, D)).astype(np.float32)
    c = rng.normal(size=(B, D)).astype(np.float32)
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
    lse, pos = lse_and_pos(
        jnp.asarray(q), jnp.asarray(c), jnp.asarray(ids, jnp.int32).astype(jnp.float32),
        jnp.asarray(log_q), 0.7, n_valid, (use_ids, use_logq), True,
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
    assert not softmax_kernel_shapes_ok(65536, 96)   # d % 128
    assert not softmax_kernel_shapes_ok(1000, 128)   # b % 128
    assert not softmax_kernel_shapes_ok(128, 128)    # too small
