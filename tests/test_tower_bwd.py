"""Fused tower-backward kernel (ops/tower_bwd.py): the custom-vjp 2-layer
ReLU path must match XLA autodiff of the same bf16-compute tower — value
exactly (forward is shared code), gradients in the bf16-operand class."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from two_tower_recommender_model_tpu.models.mlp import apply_mlp
from two_tower_recommender_model_tpu.ops.tower_bwd import fits

B, D = 1024, 128


def _params(seed=0):
    rng = np.random.default_rng(seed)
    return {
        f"layer_{i}": {
            "kernel": jnp.asarray(rng.normal(size=s, scale=0.1), jnp.float32),
            "bias": jnp.asarray(rng.normal(size=s[1], scale=0.1), jnp.float32),
        }
        for i, s in enumerate(((D, D), (D, 64)))
    }


def test_fits_gate():
    assert fits(128, 128, 64, 1024)
    assert fits(128, 128, 128, 512)
    assert not fits(128, 128, 64, 1000)  # batch off the tile grid
    assert not fits(256, 128, 64, 1024)  # wide input
    assert not fits(128, 128, 256, 1024)  # wide hidden 2


@pytest.mark.parametrize("h2", [64, 128])
def test_fused_bwd_matches_autodiff(h2):
    rng = np.random.default_rng(3)
    params = _params()
    if h2 != 64:
        params["layer_1"] = {
            "kernel": jnp.asarray(rng.normal(size=(D, h2), scale=0.1), jnp.float32),
            "bias": jnp.asarray(rng.normal(size=h2, scale=0.1), jnp.float32),
        }
    x = jnp.asarray(rng.normal(size=(B, D)), jnp.bfloat16)

    def loss(p, x, fused):
        out = apply_mlp(p, x, "relu", True, jnp.bfloat16, fused_backward=fused)
        return jnp.sum(out.astype(jnp.float32) * jnp.cos(
            jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)))

    (v_f, (dp_f, dx_f)) = jax.value_and_grad(loss, argnums=(0, 1))(
        params, x, True)
    (v_r, (dp_r, dx_r)) = jax.value_and_grad(loss, argnums=(0, 1))(
        params, x, False)
    np.testing.assert_allclose(float(v_f), float(v_r), rtol=1e-6)  # shared fwd
    np.testing.assert_allclose(
        np.asarray(dx_f, np.float32), np.asarray(dx_r, np.float32),
        atol=2e-2, rtol=2e-2)
    def check(vf, vr):
        g, e = np.asarray(vf, np.float32), np.asarray(vr, np.float32)
        np.testing.assert_allclose(g, e, atol=2e-1, rtol=2e-2)
        if np.linalg.norm(e) > 0:
            cos = (g * e).sum() / max(np.linalg.norm(g) * np.linalg.norm(e), 1e-9)
            assert cos > 0.9999, cos

    jax.tree.map(check, dp_f, dp_r)


def test_unfit_shapes_fall_back():
    """fused_backward=True with shapes off the kernel grid silently uses
    autodiff — identical values and grads."""
    rng = np.random.default_rng(5)
    params = {
        f"layer_{i}": {
            "kernel": jnp.asarray(rng.normal(size=s, scale=0.1), jnp.float32),
            "bias": jnp.asarray(rng.normal(size=s[1], scale=0.1), jnp.float32),
        }
        for i, s in enumerate(((48, 32), (32, 16)))
    }
    x = jnp.asarray(rng.normal(size=(100, 48)), jnp.float32)

    def loss(p, fused):
        return jnp.sum(apply_mlp(p, x, "relu", True, None, fused_backward=fused))

    v1, g1 = jax.value_and_grad(loss)(params, True)
    v2, g2 = jax.value_and_grad(loss)(params, False)
    assert float(v1) == float(v2)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_auto_gate_off_on_cpu():
    """auto resolves OFF in interpret environments (CPU test runs) so the
    existing oracle suites keep exercising the XLA backward; 'on' forces
    the kernel (interpret-mode) and still trains."""
    from two_tower_recommender_model_tpu import config as cfg_lib
    from two_tower_recommender_model_tpu.data import Featurizer, SyntheticClickstream
    from two_tower_recommender_model_tpu.train.step import (
        create_train_state,
        make_train_step,
    )
    import dataclasses

    mcfg = cfg_lib.two_tower_model_config(
        num_users=300, num_items=200, embedding_dim=128, layer_sizes=(128, 64),
        compute_dtype="bfloat16",
    )
    mcfg = dataclasses.replace(mcfg, fused_tower_backward="on")
    tcfg = cfg_lib.TrainConfig(batch_size=512)
    ds = SyntheticClickstream(299, 199, seed=0)
    feat = Featurizer(mcfg)
    state, opt = create_train_state(jax.random.key(0), mcfg, tcfg)
    step = make_train_step(mcfg, tcfg, opt, donate=False)
    batch = jax.tree.map(jnp.asarray, feat(ds.sample(512)))
    state2, out = step(state, batch)
    assert np.isfinite(float(out["loss"]))
    # and the tables moved
    assert not np.array_equal(np.asarray(state2.tables["t_user_id"]),
                              np.asarray(state.tables["t_user_id"]))
