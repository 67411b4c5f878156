"""Configuration dataclasses + YAML loading.

Field names and defaults mirror the reference configs so a reference user can
bring their YAML over unchanged:
  - KVAEConfig      <- reference kvae/utils/config.py:4-60
  - TrainingConfig  <- reference kvae/train/train.py:342-359
  - YAML layout     <- reference kvae/train/config.yaml (dataset/transforms/
                       training/kvae sections)

TPU-native additions (all optional, default off / auto):
  - filter_impl: "scan" | "assoc" | "pallas" — which filter implementation the
    model uses ("assoc" = O(log T) parallel-in-time associative scan,
    "pallas" = fused VMEM kernel; both validated against "scan" in tests).
  - compute_dtype: "float32" | "bfloat16" for the conv/MLP compute path
    (KF numerics always run in float32).
  - mesh_shape / data_axis: data-parallel mesh spec.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml


@dataclass
class KVAEConfig:
    # Data
    img_channels: int = 1
    img_size: int = 32

    # Latent dims
    a_dim: int = 2
    z_dim: int = 4
    u_dim: Optional[int] = None  # defaults to z_dim

    # LGSSM / mixture
    num_modes: int = 3              # K
    sticky_p_stay: float = 0.8      # self-transition prob of the sticky regime prior
    tau_init: float = 1.0           # initial Gumbel-Softmax temperature
    tau_decay_rate: float = 0.995
    tau_decay_steps: int = 1
    tau_min: float = 0.2
    dynamics_model: str = "switching"  # "switching" or "lstm"
    noise_emission: float = 0.03    # measurement noise VARIANCE (on a)
    noise_transition: float = 0.02  # process noise VARIANCE (on z)
    init_cov: float = 20.0          # initial state variance
    init_kf_matrices: float = 0.05  # std for B,C init (A inits to identity)

    # VAE arch
    out_distr: str = "bernoulli"    # "bernoulli" or "gaussian"
    encoder_channels: Optional[List[int]] = None
    encoder_kernel_size: int = 3
    encoder_stride: int = 2
    encoder_padding: int = 1

    decoder_channels: Optional[List[int]] = None
    decoder_kernel_size: int = 3
    decoder_stride: int = 2
    decoder_padding: int = 1

    noise_pixel_var: float = 0.1
    scale_reconstruction: float = 0.3

    # Beta (KL) annealing schedule
    scheduled_beta: bool = True
    start_epoch: int = 0
    end_epoch: int = 5
    start_val: float = 0.0
    end_val: float = 1.0

    # Alpha / dynamics network
    dynamics_hidden_dim: int = 50
    t_init_mask: int = 4
    t_steps_mask: int = 12

    # --- TPU-native knobs (no reference equivalent) ---
    filter_impl: str = "scan"        # "scan" | "assoc" | "pallas" |
    #                                  "pallas_adjoint" | "seqpar" | "auto"
    #                                  (validated in __post_init__)
    compute_dtype: str = "float32"   # conv/MLP compute dtype ("bfloat16" for perf)
    kf_elbo_samples: int = 1         # reparameterized z draws averaged in the
    #                                  KF ELBO (reference uses 1); >1 cuts the
    #                                  KF gradient variance at ~zero cost (the
    #                                  draws share the filter/smoother pass)
    alpha_bias_init: float = -10.0   # alpha-head bias on modes 1..K-1 at init
    #                                  (reference dyn_param.py:31-33 uses -10,
    #                                  which starves modes 1..K-1 of gradient
    #                                  while the alpha net is frozen in warmup;
    #                                  softer values let every bank train)
    noise_anneal_init: float = 1.0   # TRAINING-time multiplier on the LGSSM
    #                                  noise floors (R and the fixed Q): held at
    #                                  this value through pretrain+warmup, then
    #                                  decayed log-linearly to 1.0 over
    #                                  noise_anneal_epochs. Long sequences need
    #                                  WIDE floors to survive the warmup shock
    #                                  (the T=100 study: tight floors overflow
    #                                  f32 in the first warmup gradient) but
    #                                  TIGHT floors to make learning real
    #                                  dynamics ELBO-favorable (wide floors let
    #                                  the ELBO explain residuals as noise; the
    #                                  round-4 T=100 run learned a contractive
    #                                  A with |eig| down to 0.01 and inflated
    #                                  its learnable Q 6x instead of tracking).
    #                                  The config states the FINAL values, so
    #                                  impute/generate/serve/evaluate all run
    #                                  the true deployment model unchanged.
    #                                  NOTE: applies to R and the FIXED Q only;
    #                                  the switching model's learnable Q bank
    #                                  is initialized from noise_transition and
    #                                  trains freely.
    noise_anneal_epochs: int = 0     # ramp length (epochs after warmup) for
    #                                  the noise_anneal_init -> 1.0 decay;
    #                                  0 = drop to 1.0 at the first all-phase
    #                                  epoch.
    impute_loss_weight: float = 0.0  # weight of the explicit imputation term:
    #                                  decode C_t z_t^smooth at TRAINING-time
    #                                  masked frames and score the true pixels
    #                                  under out_distr (scaled by kf_weight so
    #                                  it ramps in with the dynamics). The
    #                                  reference trains fully observed
    #                                  (kvae/train/train.py:40-41), so its
    #                                  smoothed bridge is never pixel-
    #                                  supervised — at T=100 with a 40-frame
    #                                  planning gap that leaves the gap
    #                                  trajectory unconstrained. Requires
    #                                  training.train_mask_prob > 0.

    _FILTER_IMPLS = ("scan", "assoc", "pallas", "pallas_adjoint", "seqpar", "auto")

    def __post_init__(self):
        if self.u_dim is None:
            self.u_dim = self.z_dim
        if self.encoder_channels is None:
            self.encoder_channels = [32, 32, 32]
        if self.decoder_channels is None:
            self.decoder_channels = [32, 32, 32]
        if self.filter_impl.lower() not in self._FILTER_IMPLS:
            # A typo like "palas" would otherwise silently fall back to the
            # scan engine in KVAE._smooth_seq and lose the kernel path.
            raise ValueError(
                f"filter_impl={self.filter_impl!r} is not one of "
                f"{self._FILTER_IMPLS}"
            )
        if self.noise_anneal_init < 1.0:
            # The anneal DECAYS a widening multiplier toward the config floor;
            # a sub-1 value would silently TIGHTEN below the stated floors.
            raise ValueError(
                f"noise_anneal_init={self.noise_anneal_init} must be >= 1.0 "
                "(the multiplier decays toward 1.0 = the config's noise "
                "values; to train with tighter floors, lower noise_emission/"
                "noise_transition themselves)"
            )


@dataclass
class TrainingConfig:
    seed: int = 10
    max_epochs: int = 80
    lr: float = 1e-3
    batch_size: int = 32
    grad_clip_norm: float = 10.0
    decay_rate: float = 0.85       # LR exponential decay factor
    decay_steps: int = 20          # apply LR decay every N epochs
    weight_decay: float = 0.0
    ckpt_every: int = 5
    pretrain_vae_epochs: int = 5   # phase "vae" epochs
    warmup_epochs: int = 10        # phase "warmup" epochs
    logdir: str = "runs"
    T: int = 20
    add_imputation_plots: bool = False

    # --- TPU-native knobs ---
    num_devices: Optional[int] = None   # data-parallel width (None = all local)
    time_devices: int = 0               # sequence-parallel width: if > 1 the
    #                                     trainer builds a 2D (data x time)
    #                                     mesh, shards [B, T, ...] batches on
    #                                     both axes and runs the Kalman
    #                                     filter/smoother time-sharded
    #                                     (filter_impl is forced to "seqpar").
    #                                     Requires T % time_devices == 0.
    donate_state: bool = True           # donate train-state buffers to the jitted step
    resume_from: Optional[str] = None   # orbax checkpoint dir to resume from
    init_vae_from: Optional[str] = None # orbax ckpt dir to warm-start ONLY the
    #                                     encoder/decoder from (pretrain-VAE ->
    #                                     KVAE flow, reference vae/weights.py)
    add_noise_std: float = 0.0          # additive-noise data transform (train
    #                                     only), lifted from the YAML
    #                                     `transforms:` section; applied on
    #                                     device inside the jitted step
    dynamics_lr_mult: float = 1.0       # LR multiplier for the dynamics subtree
    #                                     (banks + alpha/regime nets). The KF
    #                                     ELBO's dynamics gradient is much
    #                                     smaller than the VAE's reconstruction
    #                                     gradient; >1 speeds up dynamics
    #                                     convergence (multi-seed study,
    #                                     PARITY.md)
    train_mask_prob: float = 0.0        # mask-aware training: per-sequence
    #                                     probability of hiding a contiguous
    #                                     span of frames from the Kalman
    #                                     update during a train step (the
    #                                     imputation regime). The reference
    #                                     trains fully observed, so at impute
    #                                     time its dynamics run on prediction
    #                                     feedback they never saw in training;
    #                                     masked training closes that
    #                                     distribution gap. 0 = off
    #                                     (reference behavior).
    train_mask_steps: int = 0           # masked-span length for
    #                                     train_mask_prob (e.g. the config's
    #                                     t_steps_mask to match the eval gap)
    train_mask_t_min: int = 1           # earliest maskable frame index (keep
    #                                     a short observed prefix so the
    #                                     filter can anchor)
    train_mask_end_epoch: int = 0       # mask curriculum end: after this
    #                                     epoch, train fully observed again
    #                                     (0 = masked to the end). Masked
    #                                     epochs teach gap bridging but trade
    #                                     away one-step prediction (measured
    #                                     at T=100: impute 0.10 -> 0.064,
    #                                     pred 0.04 -> 0.08 vs naive 0.04);
    #                                     a final unmasked stretch lets the
    #                                     run also ship a pred-capable
    #                                     checkpoint. Traced epoch gate — no
    #                                     recompiles.
    kf_weight_ramp: bool = False        # ramp kf_weight 0 -> 1 linearly over the
    #                                     warmup phase instead of the reference's
    #                                     step jump at warmup start — protects the
    #                                     pretrained VAE latents from the sudden
    #                                     KF-ELBO gradient (seed-robustness fix,
    #                                     PARITY.md multi-seed study)
    restart_seeds: int = 0              # parallel-restart triage protocol: train
    #                                     N short runs at seeds seed..seed+N-1,
    #                                     continue only the best by the val-
    #                                     imputation probe (the task metric) to
    #                                     max_epochs. Beats the KVAE seed
    #                                     lottery at the PROTOCOL level — the
    #                                     per-seed outcome variance is the
    #                                     method's, demonstrated in the
    #                                     reference itself (PARITY.md multi-seed
    #                                     + identical-data studies). 0/1 = off.
    restart_epochs: int = 30            # triage length per candidate seed
    restart_topk: int = 1               # candidates continued to max_epochs
    select_from_epoch: int = 0          # first epoch eligible for the
    #                                     kvae-best-impute / kvae-best-pred
    #                                     task-metric selection. 0 = auto: the
    #                                     first "all"-phase epoch (pretrain +
    #                                     warmup + 1). Pre-gate probes still
    #                                     run and log, but cannot claim the
    #                                     selected checkpoint: a pretrain-phase
    #                                     model (dynamics untrained) can win
    #                                     the smoothed-imputation probe purely
    #                                     through the smoother's interpolation
    #                                     prior — at T=100 it did (round-4
    #                                     verdict), shipping a model whose
    #                                     dynamics contribute nothing.
    profile_steps: int = 0              # if >0, capture a jax.profiler trace of N steps
    fused_epochs: Any = "auto"          # "auto" | true | false — whole-epoch XLA
    #                                     fusion (needs device-resident data; auto =
    #                                     on when the loader supports it)
    debug_nans: bool = False            # dev mode: jax_debug_nans (fail fast at the
    #                                     op that produced a NaN; disables fusion wins)


@dataclass
class DatasetConfig:
    type: str = "bouncing_ball"  # "bouncing_ball" | "pymunk" (npz) | "toy"
    path: Optional[str] = None   # npz path for type="pymunk"
    val_split: float = 0.2
    split_file: Optional[str] = None  # npz with explicit train_idx/val_idx
    #                                   arrays (tools/make_split.py) — overrides
    #                                   val_split; lets two frameworks train on
    #                                   IDENTICAL split membership (the parity
    #                                   A/B protocol, PARITY.md)
    # generator / loader kwargs (seq_len, normalize, num_sequences, num_balls, ...)
    kwargs: Dict[str, Any] = field(default_factory=dict)


def _filter_fields(cls, d: Dict[str, Any]) -> Dict[str, Any]:
    """Accept-and-ignore unknown keys, like the reference YAML contract
    (reference kvae/train/config.yaml:49)."""
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


def load_config(path: str | Path) -> Dict[str, Any]:
    """Parse a reference-layout YAML into typed config sections."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return parse_config_dict(raw)


def parse_config_dict(raw: Dict[str, Any]) -> Dict[str, Any]:
    kvae = KVAEConfig(**_filter_fields(KVAEConfig, raw.get("kvae", {}) or {}))
    training = TrainingConfig(**_filter_fields(TrainingConfig, raw.get("training", {}) or {}))
    transforms = raw.get("transforms", {}) or {}
    # The reference applies transforms via a host-side TransformDataset
    # wrapper (kvae/vae/train_vae.py:241-251,286-296); here they run on
    # device inside the jitted train step, so lift the spec into the
    # training config.
    training.add_noise_std = float(transforms.get("add_noise_std", 0.0))
    ds_raw = dict(raw.get("dataset", {}) or {})
    dataset = DatasetConfig(**_filter_fields(DatasetConfig, ds_raw))
    return {
        "kvae": kvae,
        "training": training,
        "dataset": dataset,
        "transforms": transforms,
        "raw": raw,
    }


def config_to_dict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)
