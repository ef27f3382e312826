"""Stage drivers — the reference's 7 script-level entry points as importable modules.

Each stage keeps the reference's artifact interface (checkpoints in/out, ``.npy`` features,
frame-level GT arrays) while the internals are jitted JAX train steps over a device mesh.
"""
