from mcpt_tpu.kernels.intersect_pallas import intersect_tris_pallas

__all__ = ["intersect_tris_pallas"]
