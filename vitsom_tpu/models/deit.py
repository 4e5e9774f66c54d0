"""DeiT: distillable ViT student + frozen ResNet-50 teacher (Flax).

Re-design of the reference's DeiT baseline
(``/root/reference/models/deit.py:10-97``), which wires vit-pytorch's
``DistillableViT`` student to a frozen torchvision ResNet-50 teacher through
``DistillWrapper`` (soft distillation, T=3, alpha=0.5).

Student architecture follows vit-pytorch's ViT: linear patch embedding with
pre/post LayerNorm, learnable position embedding, CLS token, pre-norm
transformer with fixed head_dim=64, dropout on embeddings/attention/MLP —
plus the appended distillation token whose output feeds a LayerNorm+Linear
distill head. Loss (soft): (1-a)*CE(student, y) + a*T^2*KL(distill/T || teacher/T).

Teacher quirks replicated (see ``models/resnet.py``): fc replaced by a fresh
random head, everything frozen, BatchNorm running in batch-stats mode.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from vitsom_tpu.config import Config
from vitsom_tpu.models.resnet import resnet50
from vitsom_tpu.ops.attention import _softmax_f32math_bf16store
from vitsom_tpu.train import steps as steps_lib


class PreNormTransformer(nn.Module):
    """vit-pytorch style transformer: pre-norm attn/ff, head_dim fixed.

    ``dtype`` is the block compute dtype (params stay f32, flax default
    param_dtype); scores always accumulate in f32 on the MXU. ``attn_impl``
    selects the validated score-dtype recipe (ops/attention): 'xla' keeps
    f32 score/prob tensors, 'xla_bf16' stores + softmaxes them in bf16,
    'xla_bf16s' stores bf16 with f32 softmax math. The attention keeps its
    own materialized-prob form (rather than calling multi_head_attention)
    because vit-pytorch applies dropout ON the probabilities."""

    dim: int
    depth: int
    heads: int
    head_dim: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        inner = self.heads * self.head_dim
        x = x.astype(self.dtype)
        for _ in range(self.depth):
            y = nn.LayerNorm(dtype=self.dtype)(x)
            b, n, cdim = y.shape
            # Separate q/k/v projections instead of a fused qkv Dense:
            # slicing the packed [B, N, 3, H, hd] tensor forces a per-block
            # 5-D relayout copy + 3 strided slices on TPU (profiled ~11% of
            # the emb-192 cls step in models/vit.py — same shapes here).
            # Init parity: same xavier-uniform family the fused [C, 3*inner]
            # matrix would use, fan_avg rescaled to the fused fan.
            fused_fan = nn.initializers.variance_scaling(
                (cdim + inner) / (cdim + 3 * inner), "fan_avg", "uniform"
            )
            q, k, v = (
                nn.Dense(
                    inner, use_bias=False, dtype=self.dtype,
                    kernel_init=fused_fan, name=f"{nm}_{_}",
                )(y).reshape(b, n, self.heads, self.head_dim)
                for nm in ("query", "key", "value")
            )
            scores = jnp.einsum(
                "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
            ) * self.head_dim**-0.5
            if self.attn_impl == "xla_bf16":
                # native bf16 score/prob tensors (softmax included) — halves
                # HBM passes over the [B, H, N, N] tensors fwd AND bwd
                attn = jax.nn.softmax(scores.astype(jnp.bfloat16), axis=-1)
            elif self.attn_impl == "xla_bf16s":
                # bf16 storage, f32 softmax math (custom-vjp keeps the
                # backward residual bf16 too)
                attn = _softmax_f32math_bf16store(scores.astype(jnp.bfloat16))
            else:
                attn = jax.nn.softmax(scores, axis=-1)
            attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
            out = jnp.einsum(
                "bhnm,bmhd->bnhd", attn, v.astype(attn.dtype),
                preferred_element_type=jnp.float32,
            ).reshape(b, n, inner).astype(self.dtype)
            out = nn.Dense(self.dim, dtype=self.dtype)(out)
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
            x = x + out

            y = nn.LayerNorm(dtype=self.dtype)(x)
            y = nn.Dense(self.mlp_dim, dtype=self.dtype)(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
            y = nn.Dense(self.dim, dtype=self.dtype)(y)
            y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
            x = x + y
        # final LN in f32: feeds the class/distill heads and the losses
        return nn.LayerNorm()(x.astype(jnp.float32))


class DeiT(nn.Module):
    """Distillable ViT student. ``__call__`` returns class logits (eval
    path, reference ``models/deit.py:56-57``); ``train_forward`` also
    returns the distill-token logits."""

    cfg: Config
    head_dim: int = 64  # vit-pytorch default dim_head

    def setup(self):
        c = self.cfg
        dim = c.vit.emb_dim
        num_patches = (c.data.input_size // c.vit.patch_size) ** 2
        patch_dim = c.data.num_channels * c.vit.patch_size**2

        # opt-in bf16 block compute (train.compute_dtype), mirroring the ViT
        # family: embeddings + transformer run bf16, params/heads/final LN
        # stay f32. train.attn_impl picks the score-dtype recipe.
        dtype = (
            jnp.bfloat16
            if c.train.compute_dtype == "bfloat16"
            else jnp.float32
        )
        self.dtype = dtype
        self.patch_norm_pre = nn.LayerNorm(dtype=dtype)
        self.patch_proj = nn.Dense(dim, dtype=dtype)
        self.patch_norm_post = nn.LayerNorm(dtype=dtype)
        self.pos_embedding = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, num_patches + 1, dim)
        )
        self.cls_token = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, dim))
        self.distill_token = self.param(
            "distill_token", nn.initializers.normal(1.0), (1, 1, dim)
        )
        self.emb_dropout = nn.Dropout(c.vit.attn_drop)  # reference maps attn_drop -> emb_dropout
        impl = c.train.attn_impl or "xla"
        if impl in ("pallas", "hybrid"):
            impl = "xla"  # prob-dropout attention: fused kernels don't apply
        self.transformer = PreNormTransformer(
            dim=dim,
            depth=c.vit.depth,
            heads=c.vit.heads,
            head_dim=self.head_dim,
            mlp_dim=int(dim * c.vit.mlp_ratio),
            dropout=c.vit.proj_drop,
            dtype=dtype,
            attn_impl=impl,
        )
        self.mlp_head = nn.Dense(c.data.num_classes)
        self.distill_norm = nn.LayerNorm()
        self.distill_head = nn.Dense(c.data.num_classes)

    def _embed(self, x, deterministic):
        c = self.cfg
        p = c.vit.patch_size
        b, h, w, ch = x.shape
        x = x.reshape(b, h // p, p, w // p, p, ch).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, (h // p) * (w // p), p * p * ch)
        x = self.patch_norm_post(self.patch_proj(self.patch_norm_pre(x)))
        # f32 token/pos params cast to the compute dtype at the point of use
        # (adding them raw would silently upcast the whole stream back to f32)
        cls = jnp.broadcast_to(
            self.cls_token.astype(x.dtype), (b, 1, x.shape[-1])
        )
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embedding[:, : x.shape[1]].astype(x.dtype)
        return self.emb_dropout(x, deterministic=deterministic)

    def train_forward(self, x, deterministic: bool = False):
        b = x.shape[0]
        x = self._embed(x, deterministic)
        dt = jnp.broadcast_to(
            self.distill_token.astype(x.dtype), (b, 1, x.shape[-1])
        )
        x = jnp.concatenate([x, dt], axis=1)
        x = self.transformer(x, deterministic=deterministic)
        cls_out, distill_out = x[:, 0], x[:, -1]
        return self.mlp_head(cls_out), self.distill_head(self.distill_norm(distill_out))

    def __call__(self, x, deterministic: bool = True):
        if self.is_initializing():
            # materialize the distill token/norm/head params (the eval
            # forward never touches them, but train_forward does)
            logits, _ = self.train_forward(x, deterministic=True)
            return logits
        x = self._embed(x, deterministic)
        x = self.transformer(x, deterministic=deterministic)
        return self.mlp_head(x[:, 0])


def soft_distill_loss(distill_logits, teacher_logits, temperature: float):
    """T^2 * KL(softmax(distill/T) || softmax(teacher/T)), batchmean."""
    t = temperature
    log_p = jax.nn.log_softmax(distill_logits / t, axis=-1)
    q = jax.nn.softmax(teacher_logits / t, axis=-1)
    kl = jnp.sum(q * (jnp.log(jnp.clip(q, 1e-12)) - log_p), axis=-1)
    return jnp.mean(kl) * t**2


def make_deit_train_step(cfg: Config, model: DeiT, tx, lr_schedule):
    """Distillation train step with the frozen teacher baked in as device
    constants (reference ``models/deit.py:59-63``)."""
    teacher = resnet50(cfg.data.num_classes)
    t_x = jnp.zeros((2, cfg.data.input_size, cfg.data.input_size, cfg.data.num_channels))
    t_vars = teacher.init(jax.random.key(cfg.train.seed + 13), t_x, train=True)
    teacher_params = t_vars["params"]
    teacher_stats = t_vars.get("batch_stats", {})

    # optional: locally provided pretrained torch weights (zero-egress image
    # can't download IMAGENET1K_V2; see models/resnet.py docstring)
    import os

    pth = os.path.join(cfg.data.data_dir, "resnet50.pth")
    if os.path.exists(pth):
        from vitsom_tpu.models.resnet import load_torch_resnet50

        teacher_params, teacher_stats = load_torch_resnet50(
            teacher_params, teacher_stats, pth
        )
        print(f"DeiT teacher: loaded pretrained ResNet-50 weights from {pth}")
    else:
        print(
            "=" * 72 + "\n"
            "WARNING: DeiT teacher is RANDOMLY INITIALIZED — no resnet50.pth "
            f"found in {cfg.data.data_dir!r}.\n"
            "The distillation target is noise; the published DeiT accuracy "
            "(0.857, reference README.md:66) is NOT reachable this way.\n"
            "Provide torchvision IMAGENET1K_V2 weights as "
            f"{pth!r} for teacher parity (reference models/deit.py:26-32).\n"
            + "=" * 72
        )

    alpha = cfg.distillation.alpha
    temp = cfg.distillation.temperature
    hard = cfg.distillation.hard
    base_key = steps_lib.dropout_base_key(cfg.train.seed + 7919)

    def loss_fn(params, batch, step):
        x, y = batch["image"], batch["label"]
        # teacher in batch-stats mode, no grad (stop_gradient on logits)
        teacher_logits, _ = teacher.apply(
            {"params": teacher_params, "batch_stats": teacher_stats},
            x, train=True, mutable=["batch_stats"],
        )
        teacher_logits = jax.lax.stop_gradient(teacher_logits)

        logits, distill_logits = model.apply(
            {"params": params},
            x,
            deterministic=False,
            rngs={"dropout": jax.random.fold_in(base_key, step)},
            method="train_forward",
        )
        ce = steps_lib.cross_entropy(logits, y)
        if hard:
            distill = steps_lib.cross_entropy(distill_logits, teacher_logits.argmax(-1))
        else:
            distill = soft_distill_loss(distill_logits, teacher_logits, temp)
        loss = ce * (1 - alpha) + distill * alpha
        return loss, {"train/distill_loss": loss, "train/cls_loss": ce}

    def train_step(state: steps_lib.TrainState, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, state.step
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["hp/lr"] = lr_schedule(state.step)
        return state.replace(step=state.step + 1, params=params, opt_state=opt_state), metrics

    return train_step
