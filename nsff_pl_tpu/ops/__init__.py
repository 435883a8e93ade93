"""Device-side numerical ops: ray geometry, positional encoding, sampling,
alpha compositing, softmax splatting, and Pallas kernels for the hot paths.

Everything here is pure JAX (jit/vmap/grad-compatible, static shapes).
"""
