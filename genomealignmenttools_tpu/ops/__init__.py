"""Device kernels: JAX/XLA ops + Pallas TPU kernels for the hot loops."""
