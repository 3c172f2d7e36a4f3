"""Device data model: genomes and chains as arrays ready for JAX kernels."""
