"""Small-vector helpers on trailing-dimension-3 arrays.

All geometry lives in structure-of-arrays form (``(..., 3)`` float32); these
helpers are the only place the "xyz" convention is spelled out. They work for
both jnp and np inputs (jnp ops dispatch on ndarray too).
"""

import jax.numpy as jnp


def dot(a, b, keepdims: bool = False):
    """Batched 3-vector dot product over the last axis."""
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    """Batched 3-vector cross product over the last axis."""
    return jnp.cross(a, b)


def norm(a, keepdims: bool = False):
    return jnp.sqrt(jnp.maximum(dot(a, a, keepdims=keepdims), 0.0))


def normalize(a):
    """Plain normalization: NaN/Inf on zero vectors, like Eigen ``normalized()``.

    Use :func:`safe_normalize` on any path where a zero vector is reachable
    (e.g. total-internal-reflection refraction directions, Material.hpp:240).
    """
    return a / norm(a, keepdims=True)


def safe_normalize(a, eps: float = 1e-12):
    """Normalization that returns 0 for (near-)zero vectors instead of NaN.

    Keeps masked-out lanes finite so ``jnp.where`` selections and their
    gradients stay well-defined under jit. eps floors the SQUARED norm; the
    reverse-mode VJP contains 1/|a|^3 terms, so eps must be large enough that
    they cannot overflow float32 (1e-12 -> |a| >= 1e-6 -> VJP <= ~1e18).
    """
    n2 = dot(a, a, keepdims=True)
    inv = jnp.where(n2 > eps, 1.0 / jnp.sqrt(jnp.where(n2 > eps, n2, 1.0)), 0.0)
    return a * inv


def reflect(i, n):
    """Mirror direction: ``2 (n·i) n - i`` (reference: Material.hpp:195-197).

    Note the reference convention: ``i`` points *away* from the surface
    (``wo``), and the result also points away.
    """
    return 2.0 * dot(n, i, keepdims=True) * n - i
