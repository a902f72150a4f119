"""Log-space arithmetic.

Two flavours of log-add are provided:

  * ``log_add`` — a vectorized port of the reference's piecewise-cubic
    interpolated log-add (impl/pairwiseAligner.c:235-255).  Using the same
    approximation keeps the posterior *decisions* (pairs above threshold)
    bit-aligned with the reference.  It is also branch-free and cheap on the
    TPU VPU (no exp/log transcendentals at all).
  * ``log_add_exact`` — plain ``jnp.logaddexp``.

Both are safe for -inf inputs (LOG_ZERO) and never produce NaNs for
(-inf, -inf) pairs.
"""

import jax.numpy as jnp

from .constants import LOG_ZERO

# Underflow threshold of the reference approximation
# (impl/pairwiseAligner.c:235 `#define logUnderflowThreshold 7.5`).
LOG_UNDERFLOW_THRESHOLD = 7.5


def _lookup(x):
    """Piecewise cubic approximation of log(exp(x) + 1) for x in [0, 7.5].

    Coefficients from impl/pairwiseAligner.c:238-249 (`lookup`).
    """
    p1 = ((-0.009350833524763 * x + 0.130659527668286) * x + 0.498799810682272) * x + 0.693203116424741
    p2 = ((-0.014532321752540 * x + 0.139942324101744) * x + 0.495635523139337) * x + 0.692140569840976
    p3 = ((-0.004605031767994 * x + 0.063427417320019) * x + 0.695956496475118) * x + 0.514272634594009
    p4 = ((-0.000458661602210 * x + 0.009695946122598) * x + 0.930734667215156) * x + 0.168037164329057
    return jnp.where(x <= 1.0, p1, jnp.where(x <= 2.5, p2, jnp.where(x <= 4.5, p3, p4)))


def log_add(x, y):
    """Vectorized port of the reference `logAdd` (impl/pairwiseAligner.c:251-255)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    lo = jnp.minimum(x, y)
    hi = jnp.maximum(x, y)
    d = hi - lo
    # (-inf, -inf) -> d = nan; route through the "underflow" branch -> hi.
    d = jnp.where(jnp.isnan(d), jnp.inf, d)
    use_hi = (lo == LOG_ZERO) | (d >= LOG_UNDERFLOW_THRESHOLD)
    # Clamp d so _lookup never sees out-of-domain values on the dead branch.
    d_safe = jnp.minimum(d, LOG_UNDERFLOW_THRESHOLD)
    return jnp.where(use_hi, hi, _lookup(d_safe) + lo)


def log_add_exact(x, y):
    return jnp.logaddexp(x, y)


def logsumexp_safe(a, axis=-1):
    """logsumexp that returns -inf (not NaN) for all -inf slices."""
    m = jnp.max(a, axis=axis, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    out = jnp.log(jnp.sum(jnp.exp(a - m_safe), axis=axis)) + jnp.squeeze(m_safe, axis=axis)
    return jnp.where(jnp.isfinite(jnp.squeeze(m, axis=axis)), out, LOG_ZERO)
