"""Log-space math helpers (reference: include/salmon/internal/util/SalmonMath.hpp).

The reference keeps the whole online phase in natural-log space with
logAdd/logSub primitives; here the batched equivalents are jnp ops and the
host-side scalar versions are provided for model bookkeeping.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from salmon_tpu.constants import LOG_0  # noqa: F401


def log_add(x, y):
    """Scalar/ndarray log(exp(x)+exp(y)) — host-side numpy."""
    return np.logaddexp(x, y)


def log_sub(x, y):
    """Scalar log(exp(x)-exp(y)); requires x >= y."""
    if y == LOG_0:
        return x
    if x < y:
        raise ValueError(f"log_sub requires x >= y, got {x} < {y}")
    diff = y - x
    return x + math.log1p(-math.exp(diff)) if diff < 0 else LOG_0


def jlogsumexp(x, axis=None, where=None):
    """Masked log-sum-exp on device (jnp)."""
    if where is None:
        from jax.scipy.special import logsumexp
        return logsumexp(x, axis=axis)
    neg_inf = jnp.array(LOG_0, dtype=x.dtype)
    xm = jnp.where(where, x, neg_inf)
    m = jnp.max(xm, axis=axis, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.sum(jnp.where(where, jnp.exp(xm - m), 0.0), axis=axis)
    return jnp.squeeze(m, axis=axis) + jnp.log(jnp.maximum(s, 1e-300))
