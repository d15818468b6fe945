"""Truncated-normal policy distribution on [-1, 1].

Reference: evo_motion_networks/src/functions.cpp:8-127. All clamps match:
sigma in [1e-6, 1e6], alpha/beta in [-5, 5]. Sampling is inverse-CDF of a
uniform between Theta(alpha) and Theta(beta) (functions.cpp:96-113).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SIGMA_MIN = 1e-6
SIGMA_MAX = 1e6
ALPHA_BETA_BOUND = 5.0

_SQRT_2 = jnp.sqrt(2.0)
_SQRT_2PI = jnp.sqrt(2.0 * jnp.pi)


def rand_eps(key, shape, epsilon: float = 1e-7):
    """functions.cpp:13-17: uniform in [eps, 1 - eps]."""
    return epsilon + jax.random.uniform(key, shape) * (1.0 - 2.0 * epsilon)


def normal_pdf(x, mu, sigma):
    return jnp.exp(-0.5 * ((x - mu) / sigma) ** 2) / (sigma * _SQRT_2PI)


def normal_cdf(x, mu, sigma):
    return 0.5 * (1.0 + jax.lax.erf((x - mu) / (sigma * _SQRT_2)))


def _phi(z):
    return jnp.exp(-0.5 * z * z) / _SQRT_2PI


def _theta(x):
    return 0.5 * (1.0 + jax.lax.erf(x / _SQRT_2))


def _theta_inv(t):
    return _SQRT_2 * jax.lax.erf_inv(2.0 * t - 1.0)


def _safe(mu, sigma, min_value, max_value):
    safe_sigma = jnp.clip(sigma, SIGMA_MIN, SIGMA_MAX)
    alpha = jnp.clip((min_value - mu) / safe_sigma, -ALPHA_BETA_BOUND, ALPHA_BETA_BOUND)
    beta = jnp.clip((max_value - mu) / safe_sigma, -ALPHA_BETA_BOUND, ALPHA_BETA_BOUND)
    return safe_sigma, alpha, beta


def truncated_normal_pdf(x, mu, sigma, min_value=-1.0, max_value=1.0):
    safe_sigma, alpha, beta = _safe(mu, sigma, min_value, max_value)
    return _phi((x - mu) / safe_sigma) / ((_theta(beta) - _theta(alpha)) * safe_sigma)


def truncated_normal_log_pdf(x, mu, sigma, min_value=-1.0, max_value=1.0):
    safe_sigma, alpha, beta = _safe(mu, sigma, min_value, max_value)
    z = _theta(beta) - _theta(alpha)
    return (
        -0.5 * jnp.log(2.0 * jnp.pi)
        - jnp.log(safe_sigma)
        - 0.5 * ((x - mu) / safe_sigma) ** 2
        - jnp.log(z)
    )


def truncated_normal_cdf(x, mu, sigma, min_value=-1.0, max_value=1.0):
    safe_sigma, alpha, beta = _safe(mu, sigma, min_value, max_value)
    xi = (x - mu) / safe_sigma
    z = _theta(beta) - _theta(alpha)
    return (_theta(xi) - _theta(alpha)) / z


def truncated_normal_cdf_interval(x, mu, sigma, min_value=-1.0, max_value=1.0, epsilon=1e-2):
    return truncated_normal_cdf(x + epsilon, mu, sigma, min_value, max_value) - (
        truncated_normal_cdf(x - epsilon, mu, sigma, min_value, max_value)
    )


def truncated_normal_sample(key, mu, sigma, min_value=-1.0, max_value=1.0):
    safe_sigma, alpha, beta = _safe(mu, sigma, min_value, max_value)
    u = jax.random.uniform(key, jnp.shape(mu))
    cdf = jnp.clip(_theta(alpha) + u * (_theta(beta) - _theta(alpha)), 0.0, 1.0)
    return jnp.clip(_theta_inv(cdf) * safe_sigma + mu, min_value, max_value)


def truncated_normal_entropy(mu, sigma, min_value=-1.0, max_value=1.0):
    safe_sigma, alpha, beta = _safe(mu, sigma, min_value, max_value)
    z = _theta(beta) - _theta(alpha)
    return jnp.log(jnp.sqrt(2.0 * jnp.pi * jnp.e) * safe_sigma * z) + 0.5 * (
        alpha * _phi(alpha) - beta * _phi(beta)
    ) / z


def kl_divergence(log_p, log_q):
    """functions.cpp:132-134 (pointwise integrand form)."""
    return jnp.exp(log_p) * (log_p - log_q)


def exponential_decrease(t, max_t, start: float, end: float):
    """functions.cpp:141-144: exponential decay from start to end over max_t."""
    k = -jnp.log(end / start) / max_t
    return jnp.maximum(start * jnp.exp(-k * t), end)
