"""Global numeric constants shared by the tracer.

Mirrors the reference's `src/global.hpp` / `src/Renderer.cpp:15` constants and
`src/WaveLen.hpp:7-18` CIE-1931 wavelengths (micrometers).
"""

import numpy as np

# Geometric tolerance used for AABB slack, self-intersection offsets, Dirac
# half-vector tests and shadow-distance matching (reference: Renderer.cpp:15).
EPSILON = 1e-4

# f32 scale guard for the shadow epsilons: the reference's absolute 1e-4
# works in its double arithmetic at any scene scale, but falls below one
# f32 ULP once coordinates/distances exceed ~1.7e3. Effective epsilon =
# max(EPSILON, REL_EPS * scale) = ~34 f32 ULPs of the quantity — large
# enough to absorb Woop/Moller-Trumbore rounding noise, geometrically
# negligible (8e-3 units at chessboard scale).
# MCPT_REL_EPS overrides (parity experiments only — e.g. 0 reproduces the
# reference's absolute-epsilon behavior, incl. its f32 failure modes).
import os as _os

_REL_EPS_DEFAULT = 4e-6
try:
    REL_EPS = float(_os.environ.get("MCPT_REL_EPS", _REL_EPS_DEFAULT))
except ValueError:
    raise ValueError(
        "MCPT_REL_EPS must be a finite number >= 0, got "
        f"{_os.environ['MCPT_REL_EPS']!r}"
    ) from None
if not (REL_EPS >= 0.0 and np.isfinite(REL_EPS)):
    raise ValueError(f"MCPT_REL_EPS must be finite and >= 0, got {REL_EPS}")
if REL_EPS != _REL_EPS_DEFAULT:
    import warnings as _warnings

    _warnings.warn(
        f"MCPT_REL_EPS={REL_EPS} overrides the default "
        f"{_REL_EPS_DEFAULT}: shadow-visibility predicates and "
        "self-intersection margins differ from production behavior "
        "(parity-experiment knob).",
        stacklevel=2,
    )

# Firefly clamps applied per path vertex (reference: Scene.cpp:180-182).
CLAMP_INDIRECT = 5.0
CLAMP_DIRECT = 15.0

# Sentinel "miss" distance (reference: Intersection.hpp:16 uses double max; a
# large finite float32 keeps XLA arithmetic well-defined).
T_MAX = np.float32(3.0e37)

# The three traced wavelengths in micrometers, CIE 1931 primaries
# (reference: WaveLen.hpp:7-18). Channel order is R, G, B.
WAVELEN_UM = np.array([0.700, 0.5461, 0.4358], dtype=np.float32)

# Output transfer curve (reference: Renderer.cpp:96).
INV_GAMMA = 0.45
