"""DESOM: MLP autoencoder + SOM on the bottleneck latent.

Flax composite mirroring the reference
(``/root/reference/models/desom.py:13-54``): encoder latent (e.g. 10-d)
feeds the SOM; the decoder reconstructs the flattened input; an optional
linear classifier sits on the latent. Forward returns
(logits, latent, distances, bmu) like reference ``forward`` (:50-54).

The reference's adamw branch reads attributes that are never set
(``models/desom.py:107-115``) and no shipped config selects it; this build
supports adam (the configs' choice) through the shared optimizer factory.
"""

from __future__ import annotations

import flax.linen as nn

from vitsom_tpu.config import Config
from vitsom_tpu.models.ae import build_autoencoder
from vitsom_tpu.som import layer as som
from vitsom_tpu.utils.initializers import torch_default_bias


class DESOM(nn.Module):
    cfg: Config

    def setup(self):
        self.autoencoder = build_autoencoder(self.cfg)
        latent_dim = self.cfg.som_latent_dim()
        self.prototypes = self.param(
            "prototypes",
            lambda key, shape: som.init_prototypes(key, self.cfg.som, latent_dim),
            (self.cfg.som.n_prototypes, latent_dim),
        )
        if self.cfg.classification:
            # torch default Linear init for DESOM's classifier
            # (``models/desom.py:42`` uses a bare nn.Linear)
            self.classifier = nn.Dense(
                self.cfg.data.num_classes,
                kernel_init=nn.initializers.variance_scaling(
                    1.0 / 3.0, "fan_in", "uniform"
                ),
                bias_init=torch_default_bias(latent_dim),
            )

    def __call__(self, x, train: bool = False):
        """x: flattened [B, C*H*W]. Returns (logits, z, distances, bmu)."""
        z = self.autoencoder.encode(x, train=train)
        distances = som.compute_distances(z, self.prototypes, self.cfg.som.distance_fcn)
        bmu_idx = som.bmu(distances)
        logits = self.classifier(z) if self.cfg.classification else None
        if self.is_initializing():
            # materialize decoder params (the plain forward never decodes)
            self.autoencoder.decode(z, train=train)
        return logits, z, distances, bmu_idx

    def forward_with_recon(self, x, train: bool = False):
        """Single-apply variant for the train step: also decodes the latent."""
        z = self.autoencoder.encode(x, train=train)
        distances = som.compute_distances(z, self.prototypes, self.cfg.som.distance_fcn)
        bmu_idx = som.bmu(distances)
        logits = self.classifier(z) if self.cfg.classification else None
        decoded = self.autoencoder.decode(z, train=train)
        return logits, z, distances, bmu_idx, decoded

    def decode(self, z, train: bool = False):
        return self.autoencoder.decode(z, train=train)
