"""mcpt_tpu — a TPU-native Monte Carlo path tracer with microfacet (GGX) BSDFs.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
C++/OpenMP renderer (AngelAngelXie/Final-Project-Monte-Carlo-Path-Tracer-with-
Microfacet-BSDF): spectral 3-wavelength dispersion, GGX microfacet
reflection/refraction, next-event-estimation direct lighting, Russian-roulette
termination, thin-lens depth of field, equirectangular environment maps,
BVH-accelerated OBJ meshes and analytic spheres, JSON scene configs and PNG
output — rebuilt as flat device arrays, a `lax.scan` wavefront integrator and
matmul-formulated intersection kernels, sharded over `jax.sharding.Mesh`es.

Nothing here is a translation of the reference's object graph; the reference
defines *what* is computed (cited per-function as file:line), the architecture
is array-first for TPUs.
"""

__version__ = "0.1.0"

from mcpt_tpu.constants import EPSILON, WAVELEN_UM
from mcpt_tpu.materials import Material, MaterialType, standard_materials
from mcpt_tpu.camera import Camera
from mcpt_tpu.scene import Scene, Sphere, TriangleMesh
from mcpt_tpu.render import render, render_radiance

__all__ = [
    "EPSILON",
    "WAVELEN_UM",
    "Material",
    "MaterialType",
    "standard_materials",
    "Camera",
    "Scene",
    "Sphere",
    "TriangleMesh",
    "render",
    "render_radiance",
]
