"""Liquid-time-constant (LTC) recurrent cell and wrappers.

Reference: evo_motion_networks/src/networks/liquid_cell.cpp and the
liquid_{actor,critic}.cpp / q_net_liquid.cpp wrappers. Cell dynamics
(liquid_cell.cpp:52-63): `unfolding_steps` fused-ODE iterations with
dt = 1/steps:

    f(x, i) = SiLU(W i + R x + b)
    x <- (x + dt * f * a) / (1 + dt * (1/tau + f))

Learnable a, tau, b; W/R ~ N(0, 0.1/steps) without bias; b ~ N(0, 0.1);
first hidden state = SiLU(0) = 0. Wrappers put a single reference-initialized
linear head (mu/sigma or value) on the cell output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .modules import Params, linear_init, linear_apply


def liquid_cell_init(key, input_dim: int, neurons: int, unfolding_steps: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    std_w = 0.1 / unfolding_steps
    return {
        "w": jax.random.normal(k1, (neurons, input_dim)) * std_w,
        "r": jax.random.normal(k2, (neurons, neurons)) * std_w,
        "b": jax.random.normal(k3, (1, neurons)) * 0.1,
        "a": jnp.ones((1, neurons)),
        "tau": jnp.ones((1, neurons)),
    }


def liquid_cell_first_x(neurons: int, batch_shape=()):
    return jnp.zeros(batch_shape + (neurons,))  # silu(0) = 0


def liquid_cell_apply(p: Params, x_t, state, unfolding_steps: int):
    """One forward: unfolding_steps inner ODE iterations; returns new x_t."""
    dt = 1.0 / unfolding_steps
    wi = state @ p["w"].T  # input projection is loop-invariant

    def body(_, x):
        f = jax.nn.silu(wi + x @ p["r"].T + p["b"])
        return (x + dt * f * p["a"]) / (1.0 + dt * (1.0 / p["tau"] + f))

    return jax.lax.fori_loop(0, unfolding_steps, body, x_t)


# --- wrappers (liquid_actor.cpp / liquid_critic.cpp / q_net_liquid.cpp) ----


def liquid_actor_init(key, state_dim, action_dim, neurons, unfolding_steps) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "cell": liquid_cell_init(k1, state_dim, neurons, unfolding_steps),
        "mu": linear_init(k2, neurons, action_dim),
        "sigma": linear_init(k3, neurons, action_dim),
    }


def liquid_actor_apply(p: Params, x_t, state, unfolding_steps: int):
    new_x = liquid_cell_apply(p["cell"], x_t, state, unfolding_steps)
    mu = jnp.tanh(linear_apply(p["mu"], new_x))
    sigma = jax.nn.softplus(linear_apply(p["sigma"], new_x))
    return mu, sigma, new_x


def liquid_critic_init(key, state_dim, neurons, unfolding_steps) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "cell": liquid_cell_init(k1, state_dim, neurons, unfolding_steps),
        "out": linear_init(k2, neurons, 1),
    }


def liquid_critic_apply(p: Params, x_t, state, unfolding_steps: int):
    new_x = liquid_cell_apply(p["cell"], x_t, state, unfolding_steps)
    return linear_apply(p["out"], new_x), new_x


def liquid_q_net_init(key, state_dim, action_dim, neurons, unfolding_steps) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "cell": liquid_cell_init(k1, state_dim + action_dim, neurons, unfolding_steps),
        "out": linear_init(k2, neurons, 1),
    }


def liquid_q_net_apply(p: Params, x_t, state, action, unfolding_steps: int):
    new_x = liquid_cell_apply(
        p["cell"], x_t, jnp.concatenate([state, action], -1), unfolding_steps
    )
    return linear_apply(p["out"], new_x), new_x
