"""latice_tpu — a TPU-native EBSD diffraction-pattern indexing framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of `poyentung/ebsd-vae`
("latice"): a convolutional VAE over 128x128 EBSD patterns, a latent-vector
dictionary with exact on-TPU cosine k-NN, and crystal-symmetry-aware
orientation consensus — designed SPMD-first over `jax.sharding` meshes.
"""

__version__ = "0.1.0"
