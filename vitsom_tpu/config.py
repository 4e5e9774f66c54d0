"""Typed configuration system.

Replaces the reference's raw-dict yaml loader (``tools/utils.py:14-26``) with
validated dataclasses while preserving every hyperparameter the reference
consumes (``configs/<model>/<model>_<dataset>.yaml`` in the reference tree).

Two yaml schemas are accepted:

1. The native flat schema used by ``configs/*.yaml`` in this repo.
2. The reference's nested ``hyperparameters:/data:`` schema, so configs from
   the original repo drop in unchanged.

The ``DATASET_NAME`` environment variable overrides the dataset, mirroring
reference ``tools/utils.py:22-25``.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import yaml

VALID_MODELS = ("vit_som", "desom", "vit", "swin", "deit", "mobile_vit")
VALID_DISTANCES = ("manhattan", "euclidean", "cosine")
VALID_TOPOLOGIES = ("square", "hexa")


@dataclass(frozen=True)
class SOMConfig:
    """SOM grid hyperparameters (reference ``models/som_layer.py:12-58``)."""

    map_size: Tuple[int, int] = (8, 8)
    t_max: float = 8.0
    t_min: float = 0.1
    distance_fcn: str = "manhattan"
    topology: str = "square"
    use_reduced: bool = False

    @property
    def n_prototypes(self) -> int:
        return int(self.map_size[0] * self.map_size[1])

    def validate(self) -> None:
        if self.distance_fcn not in VALID_DISTANCES:
            raise ValueError(f"distance_fcn must be one of {VALID_DISTANCES}")
        if self.topology not in VALID_TOPOLOGIES:
            raise ValueError(f"topology must be one of {VALID_TOPOLOGIES}")
        if len(self.map_size) != 2 or min(self.map_size) < 1:
            raise ValueError(f"bad map_size {self.map_size}")
        if self.t_max <= 0 or self.t_min <= 0:
            raise ValueError("temperatures must be positive")


@dataclass(frozen=True)
class ViTConfig:
    """ViT autoencoder hyperparameters (reference ``models/vit.py:69-98``)."""

    patch_size: int = 16
    emb_dim: int = 192
    depth: int = 12
    heads: int = 3
    dec_emb_dim: int = 96
    dec_depth: int = 2
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_norm: bool = False
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0  # carried in reference configs but unused by its Block
    global_pool: bool = False

    def validate(self) -> None:
        if self.emb_dim % self.heads != 0:
            raise ValueError("emb_dim must divide heads")
        if self.patch_size < 1 or self.depth < 1:
            raise ValueError("bad patch_size/depth")


@dataclass(frozen=True)
class AEConfig:
    """Fully-connected autoencoder dims (reference ``models/ae.py:13-38``)."""

    encoder_dims: Tuple[int, ...] = (500, 500, 2000, 10)
    act: str = "relu"
    batch_norm: bool = False

    def validate(self) -> None:
        if not self.encoder_dims:
            raise ValueError("encoder_dims must be non-empty")


@dataclass(frozen=True)
class SwinConfig:
    """Swin-T hyperparameters (reference ``models/swin.py:23-33``)."""

    patch_size: int = 2
    window_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    mlp_ratio: float = 4.0

    def validate(self) -> None:
        if len(self.depths) != len(self.num_heads):
            raise ValueError("depths and num_heads must align")


@dataclass(frozen=True)
class DistillConfig:
    """DeiT distillation hyperparameters (reference ``models/deit.py:46-52``)."""

    temperature: float = 3.0
    alpha: float = 0.5
    hard: bool = False


@dataclass(frozen=True)
class OptimizerConfig:
    """Optimizer/schedule hyperparameters.

    Mirrors reference ``configure_optimizers`` blocks
    (``models/vit_som.py:127-163``, ``models/desom.py:96-115``).
    ``min_lr`` is a *multiplicative factor floor* on the schedule, exactly as
    in the reference LambdaLR lambda (``models/vit_som.py:160``).
    """

    type: str = "adamw"
    lr: float = 1e-3
    min_lr: float = 0.0
    beta_1: float = 0.9
    beta_2: float = 0.999
    eps: float = 1e-8
    scheduler: str = "constant"  # "constant" | "cosine_annealing"
    warmup_epochs: int = 0
    weight_decay: float = 0.05
    layer_decay: float = 0.75
    smoothing: float = 0.0
    # torch.optim.AdamW applies its default wd (1e-2) to param groups appended
    # without an explicit weight_decay — the reference does this for the SOM
    # prototypes and cls head (``models/vit_som.py:144``). Replicated here.
    default_group_weight_decay: float = 1e-2
    # The reference computes layer-wise lr scales but never applies them
    # (``tools/utils.py:28-71``); set True to actually enable LRD.
    apply_layer_decay: bool = False

    def validate(self) -> None:
        if self.type not in ("adam", "adamw"):
            raise ValueError(f"unsupported optimizer {self.type}")
        if self.scheduler not in ("constant", "cosine_annealing", "cosine_simple"):
            raise ValueError(f"unsupported scheduler {self.scheduler}")


@dataclass(frozen=True)
class AugmentConfig:
    """Augmentation knobs (reference ``data/data.py:254-315`` + configs)."""

    horizontal_flip: float = 0.0
    randaug_n: int = 0
    randaug_m: int = 9
    resize_scale: Tuple[float, float] = (1.0, 1.0)
    resize_ratio: Tuple[float, float] = (1.0, 1.0)
    reprob: float = 0.0
    remode: str = "pixel"
    recount: int = 0
    autoaugment: bool = False


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "mnist"
    num_classes: int = 0
    num_channels: int = 1
    input_size: int = 28
    num_workers: int = 0
    data_dir: str = "data/datasets"
    # When True and the raw dataset files are absent, a deterministic
    # synthetic stand-in dataset is generated (for smoke tests / benches).
    allow_synthetic: bool = False
    synthetic_size: int = 4096
    # 0.0 = legacy trivially-separable blobs; > 0.0 = Gaussian class means
    # with spacing chosen so the PAIRWISE Bayes error is ~this value — the
    # quality-protocol generator where purity cannot saturate at 1.0
    # (datasets.make_synthetic)
    synthetic_overlap: float = 0.0
    # Class-direction generator for overlap mode (datasets.make_synthetic):
    # "g4" (default) = low-frequency fields QR-orthonormalized within the
    # smooth span (survives the augmentation stack — the cls operating
    # point); "g2" = white-noise unit directions (near-orthogonal in pixel
    # dim; the STABLE un-augmented clustering operating point — the g4
    # clustering task at ov=0.001 collapses to near-floor purity on ~half
    # the training seeds, attn_dtype_quality_v2/VERDICT.md)
    synthetic_gen: str = "g4"
    # Generate the synthetic stand-in as an OBJECT array of variable-size
    # images (faithful to jpg-dir sources like flowers-17), forcing the
    # host-PIL fork-pool + chunked-prefetch stream path instead of
    # device-augment — used to benchmark that path without dataset files.
    synthetic_object_array: bool = False
    # Run the train augmentation stack ON DEVICE (jax, batched, inside the
    # jitted epoch program) instead of per-image PIL in host workers. The
    # TPU-native default: raw uint8 data lives in HBM and the chip augments
    # its own batches (data/device_augment.py; distribution-parity tested).
    # Set false to force the exact-PIL host path. Auto-falls-back to the
    # host path for variable-size sources (jpg dirs) that can't form a
    # uniform uint8 array.
    device_augment: bool = True
    # Static mnist-family datasets: ship the RAW uint8 array across the
    # host->device link (4x smaller transfer) and materialize the /255 f32
    # copy ON DEVICE once per run. false = normalize on the host and ship
    # the f32 copy (A/B escape hatch). Epoch gathers read f32 either way:
    # u8-resident gathers measured ~0.15 s/epoch slower (TPU random-row
    # gathers on 8-bit data lose more than the 4x traffic saving buys).
    uint8_hbm: bool = True
    # dtype of the device-resident dataset copy the epoch gathers read
    # (uint8_hbm path): "float32" (default) or "bfloat16". bf16 halves the
    # per-epoch gather traffic; the model already casts inputs to bf16 when
    # train.compute_dtype=bfloat16, so only the recon-loss TARGET gains
    # quantization (~0.2% of a /255 pixel) — quality-gate before benching.
    hbm_dtype: str = "float32"
    augment: AugmentConfig = field(default_factory=AugmentConfig)

    @property
    def classification(self) -> bool:
        # Reference convention: num_classes > 0 selects the classification
        # path (``experiments/benchmarking/train_vit_som.py:41``).
        return self.num_classes > 0

    def validate(self) -> None:
        if self.hbm_dtype not in ("float32", "bfloat16"):
            raise ValueError("data.hbm_dtype must be float32 or bfloat16")


@dataclass(frozen=True)
class TrainConfig:
    """Trainer-level knobs (no reference equivalent beyond pl.Trainer args)."""

    seed: int = 0
    n_runs: int = 5
    log_every_n_steps: int = 50
    checkpoint_dir: str = "experiments/states"
    log_dir: str = "experiments/logs"
    eval_every_n_epochs: int = 1
    # classification scan mode: run the per-epoch validation pass INSIDE the
    # epoch device program (logits -> accuracy reduced on device, best-epoch
    # params tracked in the scan carry) instead of a separate host-driven
    # eval dispatch + logits pull per epoch. Same metrics/tags and the same
    # best-checkpoint artifact; the host loop goes fully deferred (each
    # per-epoch eval dispatch + transfer costs tunnel RTTs — measured ~0.5
    # s/epoch = ~250 s of a 500-epoch CIFAR run). Applies when
    # eval_every_n_epochs == 1, single process, uniform val arrays.
    fused_val: bool = True
    # device/mesh
    mesh_shape: Optional[Tuple[int, ...]] = None  # None = all local devices on 'data'
    donate_state: bool = True
    # numerics
    compute_dtype: str = "float32"  # "float32" | "bfloat16"
    use_pallas_som: bool = False
    use_pallas_attention: bool = False
    # "" = derive from use_pallas_attention; else "xla" | "pallas" | "hybrid"
    # | "xla_bf16" (hybrid = XLA forward + Pallas VMEM-recompute backward, no
    # N^2 residuals; xla_bf16 = native bf16 score/prob tensors incl. softmax)
    attn_impl: str = ""
    # rematerialize transformer blocks in the backward pass instead of saving
    # their [B, H, N, N]-sized residuals (HBM-traffic trade, vit/vit_som only)
    remat_blocks: bool = False
    # host loop
    # scan mode: epochs chained per device dispatch. Every dispatch + metric
    # pull costs a host RTT (~65 ms on tunneled backends) — chaining E epochs
    # amortizes it E-fold. Per-epoch metrics are still logged (the dispatch
    # returns [E]-stacked means); validation/image logging move to dispatch
    # boundaries when E > 1.
    epochs_per_dispatch: int = 1
    # deferred-pull mode: fence (one ~65 ms scalar pull) every Nth dispatch.
    # 1 = fence each dispatch (safest; un-fenced back-to-back dispatches have
    # measured ~3x slower per-epoch — the tunnel's stream scheduler degrades
    # with deep execution queues). Raising this amortizes the fence RTT while
    # keeping the queue bounded at N.
    fence_every_n_dispatches: int = 1
    # first-moment (adam m) accumulator dtype: "float32" (default) or
    # "bfloat16" — halves the m read+write HBM traffic of every fused adam
    # update (the SOM prototype table is 90% of params); v stays f32
    adam_mu_dtype: str = "float32"
    # unroll factor for the step scan (XLA can overlap/fuse across unrolled
    # iterations at the cost of code size)
    scan_unroll: int = 1
    checkpoint_every_n_epochs: int = 0  # 0 = only at end
    resume: bool = False
    # stream mode: train steps executed per device dispatch (amortizes the
    # per-dispatch round-trip on tunneled backends; 1 = step-per-dispatch)
    steps_per_dispatch: int = 8
    # scan mode: split each epoch's step scan into N separate dispatches
    # (one gather program + one reusable K-step chunk program). The
    # tunneled v5e worker dies when a SINGLE dispatch executes for more
    # than roughly 3-4 minutes (measured: a ~215 s pure-matmul program
    # crashes it, a ~21 s one is fine — r5 mobile_vit triage), so epochs
    # whose on-device time approaches the ceiling (MobileViT: ~0.6 s/step
    # x 390 steps) must be sub-divided. 1 = whole-epoch dispatch (default);
    # forces epochs_per_dispatch=1 and disables fused_val when > 1.
    scan_splits: int = 1
    # observability: trace this epoch with jax.profiler (-1 = off)
    profile_epoch: int = -1
    # log input/reconstruction/decoded-prototype image grids to TensorBoard
    # every N epochs (0 = off; reference DESOM logs grids during training,
    # ``models/desom.py:160-174``)
    log_images_every_n_epochs: int = 0

    def validate(self) -> None:
        valid_impls = ("", "xla", "pallas", "hybrid", "xla_bf16", "xla_bf16s")
        if self.attn_impl not in valid_impls:
            raise ValueError(f"attn_impl must be one of {valid_impls}")
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError("compute_dtype must be float32 or bfloat16")
        if self.adam_mu_dtype not in ("float32", "bfloat16"):
            raise ValueError("adam_mu_dtype must be float32 or bfloat16")


@dataclass(frozen=True)
class Config:
    model_arch: str = "vit_som"
    total_epochs: int = 10
    batch_size: int = 128
    gamma: float = 0.0
    som: SOMConfig = field(default_factory=SOMConfig)
    vit: ViTConfig = field(default_factory=ViTConfig)
    ae: AEConfig = field(default_factory=AEConfig)
    swin: SwinConfig = field(default_factory=SwinConfig)
    distillation: DistillConfig = field(default_factory=DistillConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def validate(self) -> "Config":
        if self.model_arch not in VALID_MODELS:
            raise ValueError(f"model_arch must be one of {VALID_MODELS}")
        self.som.validate()
        self.vit.validate()
        self.ae.validate()
        self.swin.validate()
        self.optimizer.validate()
        self.data.validate()
        self.train.validate()
        if self.total_epochs < 1 or self.batch_size < 1:
            raise ValueError("bad total_epochs/batch_size")
        return self

    # --- derived quantities shared across the framework ---

    @property
    def classification(self) -> bool:
        return self.data.classification

    def som_latent_dim(self) -> int:
        """Latent dim fed to the SOM (reference ``models/som_layer.py:35-40``)."""
        if self.model_arch == "vit_som":
            dim = self.vit.emb_dim
            if not self.som.use_reduced:
                num_patches = (self.data.input_size // self.vit.patch_size) ** 2
                dim *= num_patches
            return dim
        return int(self.ae.encoder_dims[-1])

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


# ---------------------------------------------------------------------------
# yaml parsing
# ---------------------------------------------------------------------------


def _tupled(x: Any) -> Any:
    if isinstance(x, list):
        return tuple(_tupled(v) for v in x)
    return x


def _build(dc_type, d: Optional[Dict[str, Any]]):
    """Construct a dataclass from a dict, ignoring unknown keys."""
    if d is None:
        return dc_type()
    names = {f.name for f in dataclasses.fields(dc_type)}
    kwargs = {k: _tupled(v) for k, v in d.items() if k in names}
    return dc_type(**kwargs)


def _from_native(doc: Dict[str, Any]) -> Config:
    data_doc = dict(doc.get("data", {}))
    aug = _build(AugmentConfig, data_doc.pop("augment", None))
    data = dataclasses.replace(_build(DataConfig, data_doc), augment=aug)
    return Config(
        model_arch=doc["model"],
        total_epochs=int(doc.get("epochs", 10)),
        batch_size=int(doc.get("batch_size", 128)),
        gamma=float(doc.get("gamma", 0.0)),
        som=_build(SOMConfig, doc.get("som")),
        vit=_build(ViTConfig, doc.get("vit")),
        ae=_build(AEConfig, doc.get("ae")),
        swin=_build(SwinConfig, doc.get("swin")),
        distillation=_build(DistillConfig, doc.get("distillation")),
        optimizer=_build(OptimizerConfig, doc.get("optimizer")),
        data=data,
        train=_build(TrainConfig, doc.get("train")),
    )


def _from_reference(doc: Dict[str, Any]) -> Config:
    """Parse the reference's nested schema (drop-in compatibility)."""
    hp = doc["hyperparameters"]
    data_doc = dict(doc.get("data", {}))
    aug = _build(AugmentConfig, data_doc.pop("augment", None))
    data = dataclasses.replace(_build(DataConfig, data_doc), augment=aug)
    som_doc = dict(hp.get("som", {}))
    # reference key names Tmax/Tmin -> t_max/t_min
    if "Tmax" in som_doc:
        som_doc["t_max"] = som_doc.pop("Tmax")
    if "Tmin" in som_doc:
        som_doc["t_min"] = som_doc.pop("Tmin")
    return Config(
        model_arch=hp["model_arch"],
        total_epochs=int(hp.get("total_epochs", 10)),
        batch_size=int(hp.get("batch_size", 128)),
        gamma=float(hp.get("gamma", 0.0)),
        som=_build(SOMConfig, som_doc),
        vit=_build(ViTConfig, hp.get("vit")),
        ae=_build(AEConfig, hp.get("ae")),
        swin=_build(SwinConfig, hp.get("swin")),
        distillation=_build(DistillConfig, hp.get("distillation")),
        optimizer=_build(OptimizerConfig, hp.get("optimizer")),
        data=data,
        train=_build(TrainConfig, doc.get("train")),
    )


_NESTED_FIELDS = {
    "som": SOMConfig,
    "vit": ViTConfig,
    "ae": AEConfig,
    "swin": SwinConfig,
    "distillation": DistillConfig,
    "optimizer": OptimizerConfig,
    "train": TrainConfig,
}


def config_from_dict(d: Dict[str, Any]) -> Config:
    """Inverse of ``Config.to_dict()`` — rebuild a validated Config.

    Used to restore the hyperparameters embedded in checkpoints
    (reference parity: ``save_hyperparameters`` makes
    ``load_from_checkpoint`` self-contained,
    ``/root/reference/models/vit_som.py:26``)."""
    doc = dict(d)
    data_doc = dict(doc.pop("data", None) or {})
    aug = _build(AugmentConfig, data_doc.pop("augment", None))
    data = dataclasses.replace(_build(DataConfig, data_doc), augment=aug)
    kwargs: Dict[str, Any] = {"data": data}
    for name, dc_type in _NESTED_FIELDS.items():
        kwargs[name] = _build(dc_type, doc.pop(name, None))
    top = {f.name for f in dataclasses.fields(Config)}
    kwargs.update({k: _tupled(v) for k, v in doc.items() if k in top})
    return Config(**kwargs).validate()


def load_config(path: str, overrides: Optional[Dict[str, Any]] = None) -> Config:
    """Load a yaml config (native or reference schema) into a ``Config``.

    ``DATASET_NAME`` env var overrides the dataset, matching reference
    ``tools/utils.py:22-25``. ``overrides`` is a flat dict of dotted keys
    (e.g. ``{"train.n_runs": 1, "total_epochs": 3}``).
    """
    with open(path, "r") as f:
        doc = yaml.safe_load(f)

    cfg = _from_reference(doc) if "hyperparameters" in doc else _from_native(doc)

    dataset_name = os.getenv("DATASET_NAME")
    if dataset_name:
        cfg = dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, dataset=dataset_name))

    if overrides:
        cfg = apply_overrides(cfg, overrides)

    return cfg.validate()


def apply_overrides(cfg: Config, overrides: Dict[str, Any]) -> Config:
    """Apply dotted-key overrides, returning a new Config."""
    for key, value in overrides.items():
        parts = key.split(".")
        cfg = _replace_path(cfg, parts, value)
    return cfg


def _replace_path(obj, parts: Sequence[str], value):
    if len(parts) == 1:
        current = getattr(obj, parts[0])
        if isinstance(current, tuple) and isinstance(value, (list, tuple)):
            value = _tupled(list(value))
        return dataclasses.replace(obj, **{parts[0]: value})
    child = getattr(obj, parts[0])
    return dataclasses.replace(obj, **{parts[0]: _replace_path(child, parts[1:], value)})
