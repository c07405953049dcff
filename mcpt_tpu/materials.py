"""Material model: four microfacet material classes + the named library.

Host-side description objects; `scene.py` compiles them into a flat
struct-of-arrays material table consumed by the device-side BSDF code in
`bsdf.py`. Semantics mirror the reference `src/Material.hpp`:

- four types (Material.hpp:13-18),
- defaults iorA=1.74, iorB=0.1, roughness=1 (0.2 for rough dielectric),
  base_reflectance=0 (Material.hpp:245-257),
- `is_dirac` for the two smooth types (Material.hpp:248-249),
- emission flag = ||emission|| > EPSILON (Material.hpp:262),
- 2-term Cauchy dispersion ior(λ) = iorA + iorB/λ² (Material.hpp:178-183),
- the 9 named conf.json materials (main.cpp:34-97) and the Cornell light
  (main.cpp:100-104 / main.cpp:303-308).
"""

from dataclasses import dataclass, field
from enum import IntEnum

import numpy as np

from mcpt_tpu.constants import EPSILON


class MaterialType(IntEnum):
    SMOOTH_CONDUCTOR = 0
    ROUGH_CONDUCTOR = 1
    SMOOTH_DIELECTRIC = 2
    ROUGH_DIELECTRIC = 3


def _default_roughness(mtype: MaterialType) -> float:
    return 0.2 if mtype == MaterialType.ROUGH_DIELECTRIC else 1.0


@dataclass
class Material:
    mtype: MaterialType = MaterialType.ROUGH_CONDUCTOR
    emission: tuple = (0.0, 0.0, 0.0)
    ior_a: float = 1.74
    ior_b: float = 0.1
    roughness: float = None  # type: ignore[assignment]
    base_reflectance: tuple = (0.0, 0.0, 0.0)
    textured: bool = False
    name: str = ""

    def __post_init__(self):
        self.mtype = MaterialType(self.mtype)
        if self.roughness is None:
            self.roughness = _default_roughness(self.mtype)
        self.emission = tuple(float(x) for x in self.emission)
        self.base_reflectance = tuple(float(x) for x in self.base_reflectance)

    @property
    def is_dirac(self) -> bool:
        return self.mtype in (
            MaterialType.SMOOTH_CONDUCTOR,
            MaterialType.SMOOTH_DIELECTRIC,
        )

    @property
    def has_emission(self) -> bool:
        return float(np.linalg.norm(self.emission)) > EPSILON


def light_emission(brightness_scale: float = 1.0) -> tuple:
    """The Cornell-style light SPD used by both scenes.

    brightness_scale * (8*(..) + 15.6*(..) + 18.4*(..)); main.cpp:303-308
    (the DEMO scene uses brightness_scale=3.9, main.cpp:100-104).
    """
    e = brightness_scale * (
        8.0 * np.array([0.747 + 0.058, 0.747 + 0.258, 0.747])
        + 15.6 * np.array([0.740 + 0.287, 0.740 + 0.160, 0.740])
        + 18.4 * np.array([0.737 + 0.642, 0.737 + 0.159, 0.737])
    )
    return tuple(float(x) for x in e)


def standard_materials() -> dict:
    """The 9 named materials of the config system (main.cpp:34-97)."""
    T = MaterialType
    mats = {
        "rough_red_conductor": Material(
            T.ROUGH_CONDUCTOR, roughness=0.1, base_reflectance=(1.0, 0.0, 0.0)
        ),
        "rough_white_conductor": Material(
            T.ROUGH_CONDUCTOR, roughness=0.4, base_reflectance=(0.725, 0.71, 0.68)
        ),
        "green_mirror": Material(
            T.ROUGH_CONDUCTOR, roughness=0.01, base_reflectance=(0.14, 1.0, 0.14)
        ),
        "gold_conductor": Material(
            T.SMOOTH_CONDUCTOR, roughness=0.0001, base_reflectance=(1.0, 0.85, 0.57)
        ),
        "silver_mirror": Material(
            T.SMOOTH_CONDUCTOR, roughness=0.001, base_reflectance=(0.972, 0.960, 0.915)
        ),
        "smooth_glass": Material(
            T.SMOOTH_DIELECTRIC, ior_a=1.7, ior_b=0.04, roughness=0.01
        ),
        "smooth_glass_gem": Material(
            T.SMOOTH_DIELECTRIC, ior_a=1.3, ior_b=0.2, roughness=0.001
        ),
        "clear_rough_plastic": Material(
            T.ROUGH_DIELECTRIC, ior_a=1.5, ior_b=0.01, roughness=0.02
        ),
        "rough_plastic": Material(
            T.ROUGH_DIELECTRIC, ior_a=1.5, ior_b=0.01, roughness=0.4
        ),
    }
    for name, m in mats.items():
        m.name = name
    return mats


def make_light_material(brightness_scale: float = 1.0) -> Material:
    return Material(
        MaterialType.ROUGH_CONDUCTOR,
        emission=light_emission(brightness_scale),
        name="light",
    )
