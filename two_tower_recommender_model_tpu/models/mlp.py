"""Functional MLP matching `torchrec.modules.mlp.MLP` semantics.

Each layer is Linear -> activation, *including the final layer* (torchrec
`Perceptron` applies the activation unconditionally — the reference towers
therefore emit non-negative (ReLU'd) embeddings; reference import
`03_model_training.py:345`, use `:408-409`). `final_activation=False` gives the
conventional linear-head variant.

Plain pytree params (no module framework): params fold cleanly into jit /
shard_map and optax without adapter layers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "none": lambda x: x,
}


def init_mlp(
    rng: jax.Array,
    in_size: int,
    layer_sizes: tuple[int, ...],
    param_dtype=jnp.float32,
) -> dict:
    """Torch-Linear-style init: W ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)), same
    for bias (matches the reference's effective init distribution)."""
    params = {}
    fan_in = in_size
    for i, out in enumerate(layer_sizes):
        rng, wk, bk = jax.random.split(rng, 3)
        bound = 1.0 / np.sqrt(fan_in)
        params[f"layer_{i}"] = {
            "kernel": jax.random.uniform(wk, (fan_in, out), param_dtype, -bound, bound),
            "bias": jax.random.uniform(bk, (out,), param_dtype, -bound, bound),
        }
        fan_in = out
    return params


def apply_mlp(
    params: dict,
    x: jax.Array,
    activation: str = "relu",
    final_activation: bool = True,
    compute_dtype=None,
    fused_backward: bool = False,
) -> jax.Array:
    act = _ACTIVATIONS[activation]
    n = len(params)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    if (fused_backward and n == 2 and activation == "relu" and final_activation):
        from two_tower_recommender_model_tpu.ops.tower_bwd import fits

        l0, l1 = params["layer_0"], params["layer_1"]
        if fits(x.shape[1], l0["kernel"].shape[1], l1["kernel"].shape[1],
                x.shape[0]):
            cast = (lambda a: a.astype(compute_dtype)) if compute_dtype else (
                lambda a: a)
            return _mlp2_relu(cast(l0["kernel"]), cast(l0["bias"]),
                              cast(l1["kernel"]), cast(l1["bias"]), x)
    for i in range(n):
        layer = params[f"layer_{i}"]
        kernel, bias = layer["kernel"], layer["bias"]
        if compute_dtype is not None:
            kernel = kernel.astype(compute_dtype)
            bias = bias.astype(compute_dtype)
        x = jnp.dot(x, kernel, preferred_element_type=jnp.float32).astype(
            x.dtype
        ) + bias
        if i < n - 1 or final_activation:
            x = act(x)
    return x


# --- fused-backward 2-layer ReLU tower (ops/tower_bwd.py, DESIGN §8a-r5) ---


def _mlp2_fwd_impl(w1, b1, w2, b2, x):
    h1 = jax.nn.relu(
        jnp.dot(x, w1, preferred_element_type=jnp.float32).astype(x.dtype) + b1)
    return jax.nn.relu(
        jnp.dot(h1, w2, preferred_element_type=jnp.float32).astype(x.dtype) + b2)


@jax.custom_vjp
def _mlp2_relu(w1, b1, w2, b2, x):
    return _mlp2_fwd_impl(w1, b1, w2, b2, x)


def _mlp2_relu_fwd(w1, b1, w2, b2, x):
    out = _mlp2_fwd_impl(w1, b1, w2, b2, x)
    return out, (w1, b1, w2, b2, x, out)


def _mlp2_relu_bwd(res, dq):
    """One Pallas grid: activation recompute + 4 matmuls + weight-grad
    accumulation, d_pooled emitted in the input's dtype. The final-ReLU
    mask uses the SAVED output (exactly the forward's bf16 decision); the
    layer-1 mask recomputes in f32 (bf16-class agreement)."""
    from two_tower_recommender_model_tpu.ops.tower_bwd import (
        tower_backward_fused,
    )

    w1, b1, w2, b2, x, out = res
    dx, dw1, db1, dw2, db2 = tower_backward_fused(
        x, dq, out, w1, b1, w2, out_dtype=x.dtype)
    return (dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype), dx)


_mlp2_relu.defvjp(_mlp2_relu_fwd, _mlp2_relu_bwd)
