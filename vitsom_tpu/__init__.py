"""vitsom-tpu: TPU-native ViT-SOM framework (JAX/Flax/optax/Pallas).

From-scratch rebuild of the capabilities of aluo7/ViT-SOM (IEEE SPL 2025)
designed for TPU: jitted device-resident train steps, XLA/Pallas SOM and
attention kernels, mesh-based data parallelism, grain-style input pipelines,
and evaluation reproducing the paper's purity/NMI/accuracy tables.
"""

__version__ = "0.1.0"
