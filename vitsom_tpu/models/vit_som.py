"""ViT-SOM: ViT autoencoder + SOM prototypes (+ optional classifier head).

Flax composite mirroring the reference model
(``/root/reference/models/vit_som.py:17-105``): the SOM input is the
flattened patch tokens (``use_reduced=False``, all shipped configs) or the
CLS token; prototypes are a trainable [P, latent] parameter; the forward
pass returns (cls_token, recon, logits, distances, bmu) exactly like the
reference ``forward`` (``models/vit_som.py:67-78``).

Loss composition, temperature, and the gamma ramp live in
``vitsom_tpu/train/steps.py`` so the whole step stays inside one jit.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from vitsom_tpu.config import Config
from vitsom_tpu.models.vit import ClsHead, build_vit_autoencoder
from vitsom_tpu.som import layer as som


class ViTSOM(nn.Module):
    cfg: Config
    attn_impl: str = "xla"

    def setup(self):
        self.vit = build_vit_autoencoder(self.cfg, attn_impl=self.attn_impl)
        latent_dim = self.cfg.som_latent_dim()
        self.prototypes = self.param(
            "prototypes",
            lambda key, shape: som.init_prototypes(key, self.cfg.som, latent_dim),
            (self.cfg.som.n_prototypes, latent_dim),
        )
        if self.cfg.classification:
            self.cls_head = ClsHead(self.cfg.data.num_classes, self.cfg.vit.emb_dim)

    def som_input(self, cls_token, patch_tokens):
        if self.cfg.som.use_reduced:
            return cls_token
        return patch_tokens.reshape(patch_tokens.shape[0], -1)

    def __call__(self, x):
        cls_token, patches, recon = self.vit(x)
        z = self.som_input(cls_token, patches)
        distances = som.compute_distances(z, self.prototypes, self.cfg.som.distance_fcn)
        bmu_idx = som.bmu(distances)
        logits = self.cls_head(cls_token) if self.cfg.classification else None
        return cls_token, recon, logits, distances, bmu_idx

    def features(self, x):
        """(cls_token, recon, logits, z) without the SOM distance matrix —
        the entry point for the fused Pallas SOM path, which consumes the
        latent ``z`` and the ``prototypes`` param directly."""
        cls_token, patches, recon = self.vit(x)
        z = self.som_input(cls_token, patches)
        logits = self.cls_head(cls_token) if self.cfg.classification else None
        return cls_token, recon, logits, z

    def get_latent_representation(self, x):
        """Flattened patch tokens (or CLS) for UMAP viz — fixes the
        reference's broken 4-tuple unpack (``models/vit_som.py:179``)."""
        cls_token, patches, _ = self.vit(x)
        return self.som_input(cls_token, patches)

    def decode_prototypes(self, prototypes):
        """Batched prototype decoding: [P, N*D] -> [P, H, W, C] images.

        Vectorizes the reference's per-prototype Python loop
        (``tools/evaluation.py:181-183,209-222``) into one decoder call:
        reshape to patch tokens, prepend a zero CLS, run the ViT decoder,
        unpatchify.
        """
        p_count = prototypes.shape[0]
        num_patches = self.vit.num_patches
        emb = self.cfg.vit.emb_dim
        tokens = prototypes.reshape(p_count, num_patches, emb)
        cls = jnp.zeros((p_count, 1, emb), dtype=tokens.dtype)
        tokens = jnp.concatenate([cls, tokens], axis=1)
        pred, _ = self.vit.forward_decoder(tokens)
        from vitsom_tpu.models.vit import unpatchify

        return unpatchify(pred, self.cfg.vit.patch_size, self.cfg.data.num_channels)


class ViTClassifier(nn.Module):
    """ViT classification baseline (reference ``models/vit.py:243-302``):
    same autoencoder backbone, CLS features -> linear head; the decoder
    exists (and is trained nowhere) exactly as in the reference, but we skip
    running it in the forward pass since its output is unused."""

    cfg: Config
    attn_impl: str = "xla"

    def setup(self):
        self.vit = build_vit_autoencoder(self.cfg, attn_impl=self.attn_impl)
        self.cls_head = ClsHead(self.cfg.data.num_classes, self.cfg.vit.emb_dim)

    def __call__(self, x):
        feats, _ = self.vit.forward_features(x)
        return self.cls_head(feats)
