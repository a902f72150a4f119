"""Signal emission density functions (jnp, elementwise / VPU-friendly).

Each function mirrors its reference counterpart bit-for-bit in formula and
constants (impl/stateMachine.c:323-371, 557-594).
"""

import jax.numpy as jnp

from ..constants import LOG_ZERO


def log_gauss_pdf(x, mu, sigma):
    """emissions_signal_logGaussPdf (impl/stateMachine.c:334-344).

    sigma == 0 -> LOG_ZERO (the reference's guard for invalid kmers).
    """
    log_inv_sqrt_2pi = -0.91893853320467267
    sigma_safe = jnp.where(sigma == 0.0, 1.0, sigma)
    a = (x - mu) / sigma_safe
    out = log_inv_sqrt_2pi - jnp.log(sigma_safe) + (-0.5 * a * a)
    return jnp.where(sigma == 0.0, LOG_ZERO, out)


def log_inv_gauss_pdf(event_noise, model_noise_mean, model_noise_lambda):
    """emissions_signal_logInvGaussPdf (impl/stateMachine.c:323-332)."""
    l_two_pi = 1.8378770664093453  # log(2*pi)
    safe_noise = jnp.where(event_noise > 0.0, event_noise, 1.0)
    safe_mean = jnp.where(model_noise_mean != 0.0, model_noise_mean, 1.0)
    safe_lambda = jnp.where(model_noise_lambda > 0.0, model_noise_lambda, 1.0)
    l_noise = jnp.log(safe_noise)
    a = (event_noise - safe_mean) / safe_mean
    l_lambda = jnp.log(safe_lambda)
    out = (l_lambda - l_two_pi - 3.0 * l_noise - safe_lambda * a * a / safe_noise) / 2.0
    bad = (event_noise <= 0.0) | (model_noise_lambda <= 0.0) | (model_noise_mean == 0.0)
    return jnp.where(bad, LOG_ZERO, out)


def log_bivariate_gauss_pdf(event_mean, event_noise, level_mean, level_sd,
                            noise_mean, noise_sd, correlation):
    """emissions_signal_getBivariateGaussPdfMatchProb (impl/stateMachine.c:557-594)."""
    p = correlation
    p_sq = p * p
    log_inv_2pi = -1.8378770664093453
    lsd = jnp.where(level_sd == 0.0, 1.0, level_sd)
    nsd = jnp.where(noise_sd == 0.0, 1.0, noise_sd)
    exp_c = -1.0 / (2.0 * (1.0 - p_sq))
    xu = (event_mean - level_mean) / lsd
    yu = (event_noise - noise_mean) / nsd
    a = exp_c * (xu * xu + yu * yu - 2.0 * p * xu * yu)
    c = log_inv_2pi - jnp.log(lsd * nsd * jnp.sqrt(1.0 - p_sq))
    bad = (level_sd == 0.0) | (noise_sd == 0.0)
    return jnp.where(bad, LOG_ZERO, c + a)


def poisson_posterior_prob(n, duration):
    """emissions_signal_poissonPosteriorProb (impl/stateMachine.c:346-371).

    n: static int 0..5; duration: array.
    """
    c = 0.00332005312085
    l_beta = 0.1397619423751586  # log(1.15)
    l_factorials = (0.0, 0.0, 0.69314718056, 1.79175946923, 3.17805383035, 4.78749174278)
    lam = duration / c
    safe_lam = jnp.where(lam > 0.0, lam, 1.0)
    a = (n + 1) * l_beta
    b = n * jnp.log(safe_lam)
    b = jnp.where(lam > 0.0, b, LOG_ZERO if n > 0 else 0.0)
    d = 2.0 * lam
    return a + b - l_factorials[n] - d
