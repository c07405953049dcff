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


# ---------------------------------------------------------------------------
# Component (SoA-of-scalars) form: a 3-vector batch is a tuple of three (B,)
# arrays. This is the HOT-PATH convention — profiling the (B,3) form on TPU
# showed >50% of integrator time in XLA `reshape`/`copy` relayouts (the
# 3-wide minor axis transposes at every Pallas boundary and every repeat);
# component tuples make all of those free bitcasts/no-ops.
# ---------------------------------------------------------------------------


def v3(a):
    """(B, 3) rows -> component tuple (x, y, z)."""
    return (a[..., 0], a[..., 1], a[..., 2])


def rows3(c):
    """Component tuple -> (B, 3) rows (boundary use only)."""
    return jnp.stack(c, axis=-1)


def dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross3(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def neg3(a):
    return (-a[0], -a[1], -a[2])


def scale3(a, s):
    """Component-wise multiply by a (B,) or scalar s."""
    return (a[0] * s, a[1] * s, a[2] * s)


def where3(mask, a, b):
    """Per-lane select between component tuples; mask is (B,) bool."""
    return (
        jnp.where(mask, a[0], b[0]),
        jnp.where(mask, a[1], b[1]),
        jnp.where(mask, a[2], b[2]),
    )


def safe_normalize3(a, eps: float = 1e-12):
    """Component-form `safe_normalize` (same eps/grad rationale)."""
    n2 = dot3(a, a)
    inv = jnp.where(n2 > eps, 1.0 / jnp.sqrt(jnp.where(n2 > eps, n2, 1.0)), 0.0)
    return scale3(a, inv)


def reflect3(i, n):
    """Component-form `reflect`: 2 (n·i) n - i."""
    s = 2.0 * dot3(n, i)
    return (s * n[0] - i[0], s * n[1] - i[1], s * n[2] - i[2])
