"""Network module and distribution tests.

Mirrors the reference suites test_functions.cpp (truncated-normal properties
incl. stress sizes and extreme sigma), test_linear_modules.cpp (batched +
unbatched shapes, mu in [-1,1], sigma > 0), test_liquid_modules.cpp, and
test_modules.cpp (BatchRenorm train/eval).
"""

import jax
import jax.numpy as jnp
import numpy as np

from evomotion_tpu.networks import distributions as D
from evomotion_tpu.networks.liquid import (
    liquid_actor_apply, liquid_actor_init, liquid_cell_apply, liquid_cell_first_x,
    liquid_cell_init, liquid_critic_apply, liquid_critic_init,
)
from evomotion_tpu.networks.modules import (
    actor_apply, actor_init, batch_renorm_apply, batch_renorm_init,
    bn_q_net_apply, bn_q_net_init, count_parameters, critic_apply, critic_init,
    q_net_apply, q_net_init, soft_update,
)


def test_truncated_normal_properties():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    # mu inside [-1, 1] and extreme sigmas, as in test_functions.cpp:85-86
    mu = jax.random.uniform(k1, (100, 4)) * 2.0 - 1.0
    sigma = jax.nn.softplus(jax.random.uniform(k2, (100, 4)) * 60 - 30)
    sample = D.truncated_normal_sample(k3, mu, sigma)
    assert sample.shape == mu.shape
    assert bool((sample >= -1.0).all()) and bool((sample <= 1.0).all())
    assert not bool(jnp.isnan(sample).any())

    pdf = D.truncated_normal_pdf(sample, mu, sigma)
    log_pdf = D.truncated_normal_log_pdf(sample, mu, sigma)
    ent = D.truncated_normal_entropy(mu, sigma)
    for x in (pdf, log_pdf, ent):
        assert x.shape == mu.shape
        assert not bool(jnp.isnan(x).any())
        assert not bool(jnp.isinf(x).any())
    assert bool((pdf >= 0).all())


def test_truncated_normal_logpdf_matches_log_of_pdf():
    key = jax.random.PRNGKey(1)
    mu = jnp.zeros((16,))
    sigma = jnp.full((16,), 0.5)
    x = jax.random.uniform(key, (16,)) * 2 - 1
    np.testing.assert_allclose(
        np.asarray(D.truncated_normal_log_pdf(x, mu, sigma)),
        np.log(np.asarray(D.truncated_normal_pdf(x, mu, sigma))),
        atol=1e-5,
    )


def test_truncated_normal_cdf_monotone():
    mu = jnp.zeros((1,))
    sigma = jnp.ones((1,))
    xs = jnp.linspace(-1, 1, 11)[:, None]
    cdf = D.truncated_normal_cdf(xs, mu, sigma)
    assert bool((jnp.diff(cdf[:, 0]) >= 0).all())
    assert abs(float(cdf[0, 0])) < 1e-4
    assert abs(float(cdf[-1, 0]) - 1.0) < 1e-4


def test_exponential_decrease():
    assert abs(float(D.exponential_decrease(0, 100, 0.1, 0.01)) - 0.1) < 1e-6
    assert abs(float(D.exponential_decrease(100, 100, 0.1, 0.01)) - 0.01) < 1e-6
    assert abs(float(D.exponential_decrease(1000, 100, 0.1, 0.01)) - 0.01) < 1e-7


def test_actor_shapes_and_bounds():
    key = jax.random.PRNGKey(2)
    p = actor_init(key, 5, 3, 16)
    s = jax.random.normal(key, (7, 5))
    mu, sigma = actor_apply(p, s)
    assert mu.shape == (7, 3) and sigma.shape == (7, 3)
    assert bool((mu >= -1).all()) and bool((mu <= 1).all())
    assert bool((sigma > 0).all())
    # unbatched input (the reference auto-unsqueezes; jnp broadcasting covers it)
    mu1, sigma1 = actor_apply(p, s[0])
    assert mu1.shape == (3,)


def test_critic_and_q_shapes():
    key = jax.random.PRNGKey(3)
    cp = critic_init(key, 5, 16)
    assert critic_apply(cp, jax.random.normal(key, (7, 5))).shape == (7, 1)
    qp = q_net_init(key, 5, 3, 16)
    q = q_net_apply(qp, jax.random.normal(key, (7, 5)), jax.random.normal(key, (7, 3)))
    assert q.shape == (7, 1)
    assert count_parameters(qp) > 0


def test_batch_renorm_train_eval():
    params, state = batch_renorm_init(4)
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (32, 4)) * 3 + 1
    y, state2 = batch_renorm_apply(params, state, x, training=True)
    assert y.shape == x.shape
    # at step 0, r_max=1 and d_max=0 -> plain standardization
    np.testing.assert_allclose(float(y.mean()), 0.0, atol=1e-5)
    assert int(state2["step"]) == 1
    assert not np.allclose(np.asarray(state2["running_mean"]), 0.0)
    # eval mode: uses running stats, state unchanged
    y_eval, state3 = batch_renorm_apply(params, state2, x[:1], training=False)
    assert y_eval.shape == (1, 4)
    assert int(state3["step"]) == 1


def test_bn_q_net():
    key = jax.random.PRNGKey(5)
    params, state = bn_q_net_init(key, 5, 3, 8)
    s = jax.random.normal(key, (6, 5))
    a = jax.random.normal(key, (6, 3))
    q, state2 = bn_q_net_apply(params, state, s, a, True)
    assert q.shape == (6, 1)
    q_eval, _ = bn_q_net_apply(params, state2, s, a, False)
    assert not bool(jnp.isnan(q_eval).any())


def test_liquid_cell():
    key = jax.random.PRNGKey(6)
    p = liquid_cell_init(key, 5, 8, 3)
    x0 = liquid_cell_first_x(8, (4,))
    assert bool((x0 == 0).all())  # silu(0) = 0
    s = jax.random.normal(key, (4, 5))
    x1 = liquid_cell_apply(p, x0, s, 3)
    assert x1.shape == (4, 8)
    assert not bool(jnp.isnan(x1).any())
    # stateful chain diverges from x0
    x2 = liquid_cell_apply(p, x1, s, 3)
    assert not np.allclose(np.asarray(x1), np.asarray(x2))


def test_liquid_actor_critic():
    key = jax.random.PRNGKey(7)
    ap = liquid_actor_init(key, 5, 3, 8, 2)
    x = liquid_cell_first_x(8, (4,))
    s = jax.random.normal(key, (4, 5))
    mu, sigma, new_x = liquid_actor_apply(ap, x, s, 2)
    assert mu.shape == (4, 3) and bool((mu >= -1).all()) and bool((sigma > 0).all())
    assert new_x.shape == (4, 8)
    cp = liquid_critic_init(key, 5, 8, 2)
    v, _ = liquid_critic_apply(cp, x, s, 2)
    assert v.shape == (4, 1)


def test_soft_update():
    a = {"w": jnp.zeros((3,))}
    b = {"w": jnp.ones((3,))}
    c = soft_update(a, b, 0.1)
    np.testing.assert_allclose(np.asarray(c["w"]), 0.1)


def test_loss_meter():
    from evomotion_tpu.train.metrics import LossMeter

    m = LossMeter("x", 3)
    assert m.loss() == 0.0
    for v in (1.0, 2.0, 3.0, 4.0):
        m.add(v)
    assert m.loss() == 3.0  # window of 3: mean(2,3,4)
    assert m.to_string() == "x = 3.000000"
