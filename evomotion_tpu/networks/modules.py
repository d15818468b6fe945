"""Functional NN modules: explicit param pytrees, jit/scan/vmap friendly.

Reference modules (evo_motion_networks/src/networks/*.cpp):
- ActorModule: Linear-Mish-LayerNorm x2 head, mu = Linear+Tanh,
  sigma = Linear+Softplus (actor.cpp:9-33)
- CriticModule: 2 blocks + Linear->1 (critic.cpp:8-21)
- QNetworkModule: 3 blocks on concat(state, action) (q_net.cpp:8-31)
- BatchNormQNetworkModule: BatchRenorm between every layer incl. the input
  (q_net_bn.cpp:9-33)
- weight init: xavier-normal gain 0.1, bias N(0, 0.1); LayerNorm ones/zeros
  (init.cpp:7-18)

Design: a module is (init_fn -> params, apply_fn(params, x)). Stateful modules
(BatchRenorm, liquid cells) thread an explicit state pytree. No flax — the
reference's module graph is tiny and explicit pytrees keep every agent update
a pure function.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = Any


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _xavier_normal(key, shape, gain: float):
    fan_out, fan_in = shape
    std = gain * jnp.sqrt(2.0 / (fan_in + fan_out))
    return jax.random.normal(key, shape) * std


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True) -> Params:
    """torch::nn::Linear with the reference init (init.cpp:7-13)."""
    kw, kb = jax.random.split(key)
    p = {"w": _xavier_normal(kw, (out_dim, in_dim), 0.1)}
    if bias:
        p["b"] = jax.random.normal(kb, (out_dim,)) * 0.1
    return p


def linear_apply(p: Params, x):
    y = x @ p["w"].T
    return y + p["b"] if "b" in p else y


def layer_norm_init(dim: int) -> Params:
    return {"g": jnp.ones((dim,)), "b": jnp.zeros((dim,))}


def layer_norm_apply(p: Params, x, eps: float = 1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["g"] + p["b"]


def _mlp_block_init(key, in_dim, hidden):
    k1, k2 = jax.random.split(key)
    return {"lin": linear_init(k1, in_dim, hidden), "ln": layer_norm_init(hidden)}


def _mlp_block_apply(p, x):
    return layer_norm_apply(p["ln"], mish(linear_apply(p["lin"], x)))


# --- Actor -----------------------------------------------------------------


def actor_init(key, state_dim: int, action_dim: int, hidden: int) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "h1": _mlp_block_init(k1, state_dim, hidden),
        "h2": _mlp_block_init(k2, hidden, hidden),
        "mu": linear_init(k3, hidden, action_dim),
        "sigma": linear_init(k4, hidden, action_dim),
    }


def actor_apply(p: Params, state):
    h = _mlp_block_apply(p["h2"], _mlp_block_apply(p["h1"], state))
    mu = jnp.tanh(linear_apply(p["mu"], h))
    sigma = jax.nn.softplus(linear_apply(p["sigma"], h))
    return mu, sigma


# --- Critic ----------------------------------------------------------------


def critic_init(key, state_dim: int, hidden: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "h1": _mlp_block_init(k1, state_dim, hidden),
        "h2": _mlp_block_init(k2, hidden, hidden),
        "out": linear_init(k3, hidden, 1),
    }


def critic_apply(p: Params, state):
    h = _mlp_block_apply(p["h2"], _mlp_block_apply(p["h1"], state))
    return linear_apply(p["out"], h)


# --- Q network -------------------------------------------------------------


def q_net_init(key, state_dim: int, action_dim: int, hidden: int) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "h1": _mlp_block_init(k1, state_dim + action_dim, hidden),
        "h2": _mlp_block_init(k2, hidden, hidden),
        "h3": _mlp_block_init(k3, hidden, hidden),
        "out": linear_init(k4, hidden, 1),
    }


def q_net_apply(p: Params, state, action):
    x = jnp.concatenate([state, action], axis=-1)
    h = _mlp_block_apply(p["h1"], x)
    h = _mlp_block_apply(p["h2"], h)
    h = _mlp_block_apply(p["h3"], h)
    return linear_apply(p["out"], h)


# --- Batch renormalization -------------------------------------------------
# Reference: networks/batch_renorm.cpp:7-59; defaults eps 1e-5, momentum 0.01,
# affine, warmup 1e5 steps, r_max 1->3, d_max 0->5.


def batch_renorm_init(dim: int) -> tuple[Params, Params]:
    params = {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
    state = {
        "running_mean": jnp.zeros((dim,)),
        "running_std": jnp.ones((dim,)),
        "step": jnp.int32(0),
    }
    return params, state


def batch_renorm_apply(
    params: Params,
    state: Params,
    x,
    training: bool,
    eps: float = 1e-5,
    momentum: float = 0.01,
    warmup_steps: int = 100_000,
):
    """Returns (y, new_state). `training` must be a static bool."""
    if training:
        batch_mean = x.mean(0)
        batch_std = x.std(0) + eps  # biased std like torch x.std(0, false)
        t = jnp.minimum(state["step"], warmup_steps).astype(jnp.float32)
        r_max = 1.0 + t * (3.0 - 1.0) / warmup_steps
        d_max = 0.0 + t * (5.0 - 0.0) / warmup_steps
        r = jax.lax.stop_gradient(
            jnp.clip(batch_std / state["running_std"], 1.0 / r_max, r_max)
        )
        d = jax.lax.stop_gradient(
            jnp.clip(
                (batch_mean - state["running_mean"]) / (state["running_std"] + eps),
                -d_max,
                d_max,
            )
        )
        y = (x - batch_mean) / batch_std * r + d
        new_state = {
            "running_mean": (1.0 - momentum) * state["running_mean"]
            + momentum * jax.lax.stop_gradient(batch_mean),
            "running_std": (1.0 - momentum) * state["running_std"]
            + momentum * jax.lax.stop_gradient(batch_std),
            "step": jnp.minimum(state["step"] + 1, warmup_steps),
        }
    else:
        y = (x - state["running_mean"]) / (state["running_std"] + eps)
        new_state = state
    return params["weight"] * y + params["bias"], new_state


def bn_q_net_init(key, state_dim: int, action_dim: int, hidden: int) -> tuple[Params, Params]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bn0p, bn0s = batch_renorm_init(state_dim + action_dim)
    bn1p, bn1s = batch_renorm_init(hidden)
    bn2p, bn2s = batch_renorm_init(hidden)
    bn3p, bn3s = batch_renorm_init(hidden)
    params = {
        "bn0": bn0p, "bn1": bn1p, "bn2": bn2p, "bn3": bn3p,
        "l1": linear_init(k1, state_dim + action_dim, hidden),
        "l2": linear_init(k2, hidden, hidden),
        "l3": linear_init(k3, hidden, hidden),
        "out": linear_init(k4, hidden, 1),
    }
    state = {"bn0": bn0s, "bn1": bn1s, "bn2": bn2s, "bn3": bn3s}
    return params, state


def bn_q_net_apply(params: Params, state: Params, s, a, training: bool):
    x = jnp.concatenate([s, a], axis=-1)
    x, s0 = batch_renorm_apply(params["bn0"], state["bn0"], x, training)
    x = mish(linear_apply(params["l1"], x))
    x, s1 = batch_renorm_apply(params["bn1"], state["bn1"], x, training)
    x = mish(linear_apply(params["l2"], x))
    x, s2 = batch_renorm_apply(params["bn2"], state["bn2"], x, training)
    x = mish(linear_apply(params["l3"], x))
    x, s3 = batch_renorm_apply(params["bn3"], state["bn3"], x, training)
    q = linear_apply(params["out"], x)
    return q, {"bn0": s0, "bn1": s1, "bn2": s2, "bn3": s3}


# --- misc helpers ----------------------------------------------------------


def exp_module(x):
    """ExpModule (networks/misc.cpp — unused helper in the reference)."""
    return jnp.exp(x)


def clamp_module(x, min_value: float, max_value: float):
    """ClampModule (networks/misc.cpp)."""
    return jnp.clip(x, min_value, max_value)


def count_parameters(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


def hard_update(target, source):
    """functions.cpp hard_update."""
    return jax.tree.map(lambda _, s: s, target, source)


def soft_update(target, source, tau: float):
    """functions.cpp soft_update (Polyak averaging)."""
    return jax.tree.map(lambda t, s: tau * s + (1.0 - tau) * t, target, source)
