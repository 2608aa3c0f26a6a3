"""Scene and image I/O (host-side, NumPy; no JAX here)."""
