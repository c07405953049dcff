from mcpt_tpu.io.png import read_png, write_png
from mcpt_tpu.io.obj import load_obj

__all__ = ["read_png", "write_png", "load_obj"]
