"""Typed configuration tree for the LoFTR-TPU framework.

Replaces the reference's yacs CfgNode system (/root/reference/src/config/default.py:1-171)
with frozen dataclasses.  Same three-level precedence semantics: defaults -> main
(model/trainer) overrides -> data overrides, last wins
(/root/reference/train.py:63-65, configs/data/base.py:1-4), expressed here as
successive ``Config.replaced(**nested_dict)`` merges.

All default values mirror /root/reference/src/config/default.py unless noted.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence


def _merge_dataclass(obj, overrides: Mapping[str, Any]):
    """Recursively apply a nested dict of overrides to a (frozen) dataclass."""
    updates = {}
    for key, value in overrides.items():
        if not hasattr(obj, key):
            raise KeyError(f"{type(obj).__name__} has no config field {key!r}")
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, Mapping):
            updates[key] = _merge_dataclass(current, value)
        else:
            updates[key] = value
    return dataclasses.replace(obj, **updates)


@dataclass(frozen=True)
class BackboneConfig:
    # reference: src/config/default.py:12-14
    initial_dim: int = 128
    block_dims: tuple = (128, 196, 256)
    # reference: src/config/default.py:7 RESOLUTION=(8,2); (16,4) variant supported
    resolution: tuple = (8, 2)
    # 'batch' matches the reference BatchNorm2d (resnet_fpn.py:20-21); 'group'
    # is the TPU-friendly alternative that needs no cross-device stat sync.
    norm: str = "batch"
    # Winograd F(2x2,3x3) for the stride-1 3x3 convs at inference
    # (ops/winograd.py).  MEASURED SLOWER on v5e than XLA's direct conv
    # (which already runs at ~peak MXU; see ops/winograd.py header) -
    # retained as a validated reference implementation.  Keep False.
    winograd: bool = False


@dataclass(frozen=True)
class AttentionConfig:
    """One LocalFeatureTransformer stack (coarse or fine).

    reference: src/config/default.py:17-23 (coarse), :39-44 (fine)
    """
    d_model: int = 256
    d_ffn: int = 256
    nhead: int = 8
    layer_names: tuple = ("self", "cross") * 4
    attention: str = "linear"  # ['linear', 'full']
    temp_bug_fix: bool = True  # position_encoding.py:25-28
    # head-fused linear attention: same math as 'linear', restructured so
    # every matmul runs at full MXU width (ops/attention.py::
    # linear_attention_fused_heads).  MEASURED SLOWER end-to-end at the
    # coarse scale (v5e 640x480: 172 vs 221 pairs/s — the 8x flop overhead
    # exceeds XLA's per-head tile waste at L=4800); kept as an option for
    # shapes where per-head outputs are tiny relative to L.
    fused_heads: bool = False
    # fused Pallas encoder layers (inference only): VMEM-resident
    # projections + KV-form linear attention + FFN per layer application
    # (ops/pallas/coarse_layer.py); training keeps the XLA path.
    # Measured 1.57 -> 0.87 ms/pair for the 8-layer coarse stack (v5e,
    # B=32, 640x480).  Only consulted for the coarse stack.
    use_pallas: bool = True
    # sequence parallelism (SURVEY.md §5.7 new capability): mesh axis name
    # to shard the coarse token axis over, or None.  Requires an ambient
    # mesh (jax.set_mesh) with that axis and attention='linear'; takes
    # precedence over use_pallas (the fused single-device kernel cannot
    # consume a token-sharded sequence).  Only consulted for the coarse
    # stack - fine windows are tiny and stay data-parallel.
    seq_axis: str | None = None


@dataclass(frozen=True)
class MatchCoarseConfig:
    # reference: src/config/default.py:26-36
    thr: float = 0.2
    border_rm: int = 2
    match_type: str = "dual_softmax"  # ['dual_softmax', 'sinkhorn']
    dsmax_temperature: float = 0.1
    skh_iters: int = 3
    skh_init_bin_score: float = 1.0
    skh_prefilter: bool = False
    train_coarse_percent: float = 0.2
    train_pad_num_gt_min: int = 200
    sparse_spvs: bool = True
    # --- TPU-native additions (static-shape capacity; replaces data-dependent M,
    # coarse_matching.py:198-236, and the DDP-deadlock padding hacks) ---
    max_matches: int = 1024           # inference top-K capacity per pair
    train_matches: int = 0            # train capacity; 0 => derive from
    #                                   train_coarse_percent * L at trace time
    train_sampling: str = "per_pair"  # ['per_pair', 'global_replacement']
    #                                   predicted-slot sampling semantics
    #                                   (ops/matching.py::select_train_matches;
    #                                   multi-seed A/B: tools/seed_sweep.py
    #                                   -> perf/seed_sweep.json)
    use_pallas: bool = True           # fused Pallas matcher (inference only;
    #                                   skips materializing conf_matrix).
    #                                   Default ON: this is the shipped
    #                                   inference path (parity-tested vs the
    #                                   XLA oracle, tests/test_pallas_match.py
    #                                   + tests/test_model.py default-config
    #                                   equivalence); training always uses
    #                                   the differentiable XLA path.


@dataclass(frozen=True)
class FineConfig:
    # reference: src/config/default.py:8-9,39-44
    window_size: int = 5
    concat_coarse_feat: bool = True
    d_model: int = 128
    d_ffn: int = 128
    nhead: int = 8
    layer_names: tuple = ("self", "cross")
    attention: str = "linear"
    # fused Pallas fine stage (inference only; training keeps the
    # differentiable XLA path) — see ops/pallas/fine_stage.py.  Default ON:
    # shipped inference path, parity-tested in tests/test_fine_stage_fused.py.
    use_pallas: bool = True
    # TRAINING-time fused fine stage: custom-VJP hybrid (Pallas forward +
    # recomputed-XLA backward, ops/fine_stage_hybrid.py).  A/B RESULT
    # (tools/fine_hybrid_ab.py -> perf/fine_hybrid_ab.json): convergence is
    # identical (held-out pose AUC within 0.011 at every threshold), but
    # the flagship 640x480 B=8 step measures 21.8 vs 25.9 pairs/s — the
    # rematerialized-XLA backward pays the fine forward twice, which costs
    # more than the Pallas forward saves.  Default stays OFF (measured
    # negative result); a full Pallas backward kernel would be required to
    # win here.  Same bf16/lane gates as use_pallas.
    use_pallas_train: bool = False
    # window extraction: 'direct' gathers only the K selected windows
    # (measured 2.8x faster at K=1024/B=32 on v5e: 0.41 vs 1.15 ms/pair
    # per side); 'unfold' materializes all L windows then row-gathers
    # (better backward: dense slice-adds instead of scatter-adds).
    # 'auto' = direct for inference, unfold for training.
    gather: str = "auto"
    # head-fused linear attention on the XLA TRAINING path (eval keeps the
    # plain oracle): the per-head [25, d=16] einsums at B*K=15k windows
    # are MXU-issue-bound in fwd+bwd; full-C block-diag matmuls trade 8x
    # FLOPs for full-width issues (linear_attention_fused_heads — exact
    # math, oracle-tested).  Measured +16.5% train step at B=8 640x480.
    fused_heads: bool = True
    # windows packed per fused-kernel attention row (ops/pallas/
    # fine_stage.py::_attention).  Swept P=1/2/4 at flagship shapes
    # (perf ledger round 4): NEGATIVE — P>1 adds cross-window masking work
    # without improving MXU issue width, so 1 stays the default.  Kept as
    # a config knob so the experiment remains reachable.
    win_pack: int = 1


@dataclass(frozen=True)
class LossConfig:
    # reference: src/config/default.py:48-63
    coarse_type: str = "focal"  # ['focal', 'cross_entropy']
    coarse_weight: float = 1.0
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    pos_weight: float = 1.0
    neg_weight: float = 1.0
    fine_type: str = "l2_with_std"  # ['l2_with_std', 'l2']
    fine_weight: float = 1.0
    fine_correct_thr: float = 1.0
    # fused Pallas coarse loss (training): requires dual_softmax + dense
    # supervision + focal; the [B,L,S] conf matrix is never materialized.
    # Default ON (round-4 decision): custom-VJP parity is tested at fwd,
    # grad, and full-train-step level (tests/test_pallas_loss.py), the
    # overfit convergence A/B is indistinguishable (identical match set +
    # geometry, loss -> 0 both arms), and it measures +4.3% train
    # throughput at B=8 (perf/train_bench.json).  Engages on TPU only
    # (matcher gate); CPU runs keep the XLA oracle path unless
    # force_pallas_cpu (interpret-mode parity tests).
    use_pallas: bool = True
    force_pallas_cpu: bool = False


@dataclass(frozen=True)
class ModelConfig:
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    coarse: AttentionConfig = field(default_factory=AttentionConfig)
    match_coarse: MatchCoarseConfig = field(default_factory=MatchCoarseConfig)
    fine: FineConfig = field(default_factory=FineConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    # compute dtype for the network body; params stay fp32
    dtype: str = "float32"
    # two-image fast-path packing (ops/packing.py): 'concat' (reference
    # batch-axis concat; fastest on ONE chip, 137.9 vs 133.9 pairs/s) or
    # 'interleave' (shard-local under a data-sharded batch: eliminates
    # 1.5 GB/step of GSPMD activation resharding, perf/scaling_model.json).
    # Multi-device entry points (Trainer with world_size>1, meshed serve,
    # train.py, dryrun) switch to 'interleave' automatically.
    batch_packing: str = "concat"


@dataclass(frozen=True)
class DatasetConfig:
    # reference: src/config/default.py:67-99
    trainval_data_source: str | None = None
    train_data_root: str | None = None
    train_npz_root: str | None = None
    train_list_path: str | None = None
    train_intrinsic_path: str | None = None
    val_data_root: str | None = None
    val_npz_root: str | None = None
    val_list_path: str | None = None
    val_intrinsic_path: str | None = None
    test_data_source: str | None = None
    test_data_root: str | None = None
    test_npz_root: str | None = None
    test_list_path: str | None = None
    test_intrinsic_path: str | None = None
    min_overlap_score_train: float = 0.4
    min_overlap_score_test: float = 0.0
    augmentation_type: str | None = None
    mgdpt_img_resize: int = 640
    mgdpt_img_pad: bool = True
    mgdpt_depth_pad: bool = True
    mgdpt_df: int = 8


@dataclass(frozen=True)
class TrainerConfig:
    # reference: src/config/default.py:102-164 + train.py:70-77 scaling rule
    canonical_bs: int = 64
    canonical_lr: float = 6e-3
    optimizer: str = "adamw"  # ['adam', 'adamw']
    adam_decay: float = 0.0
    adamw_decay: float = 0.1
    warmup_type: str = "linear"  # ['linear', 'constant']
    warmup_ratio: float = 0.0
    warmup_step: int = 4800
    scheduler: str = "MultiStepLR"  # [MultiStepLR, CosineAnnealing, ExponentialLR]
    scheduler_interval: str = "epoch"  # ['epoch', 'step']
    mslr_milestones: tuple = (3, 6, 9, 12)
    mslr_gamma: float = 0.5
    cosa_tmax: int = 30
    elr_gamma: float = 0.999992
    epi_err_thr: float = 5e-4
    ransac_pixel_thr: float = 0.5
    ransac_conf: float = 0.99999
    ransac_max_iters: int = 10000
    pose_estimation_method: str = "RANSAC"
    data_sampler: str = "scene_balance"
    n_samples_per_subset: int = 200
    sb_subset_sample_replacement: bool = True
    sb_subset_shuffle: bool = True
    sb_repeat: int = 1
    gradient_clipping: float = 0.5
    seed: int = 66
    max_epochs: int = 30
    steps_per_epoch: int = 0  # required for epoch-interval schedules under jit
    # gradient accumulation (TPU-native addition; no reference counterpart):
    # the canonical recipe is bs=64 over 32-64 GPUs (docs/TRAINING.md:60) —
    # accum_steps recovers the effective batch on small slices.  The LR
    # scaling rule counts the EFFECTIVE batch (accum included); the
    # optimizer applies once per accum_steps micro-batches
    # (optax.MultiSteps).  NB: BatchNorm statistics update per micro-batch
    # (EMA over smaller batches than the reference's synced-BN step) — use
    # backbone.norm='group' if that matters at tiny micro-batches.
    accum_steps: int = 1


@dataclass(frozen=True)
class Config:
    loftr: ModelConfig = field(default_factory=ModelConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)

    def replaced(self, overrides: Mapping[str, Any] | None = None, **kw) -> "Config":
        """Return a new Config with nested-dict overrides applied (last wins)."""
        cfg = self
        if overrides:
            cfg = _merge_dataclass(cfg, overrides)
        if kw:
            cfg = _merge_dataclass(cfg, kw)
        return cfg

    def scaled_lr(self, world_size: int, batch_size_per_device: int) -> tuple:
        """Linear LR scaling rule (reference train.py:70-77).

        The effective batch includes gradient accumulation.
        Returns (true_lr, warmup_step_scaled)."""
        true_bs = (world_size * batch_size_per_device
                   * max(1, self.trainer.accum_steps))
        scaling = true_bs / self.trainer.canonical_bs
        return self.trainer.canonical_lr * scaling, int(
            self.trainer.warmup_step / max(scaling, 1e-12))


# ---------------------------------------------------------------------------
# Named presets mirroring configs/loftr/* in the reference.
# ---------------------------------------------------------------------------

def default_config() -> Config:
    return Config()


def indoor_ds() -> Config:
    """configs/loftr/indoor/loftr_ds_dense.py: dense spvs, dual-softmax."""
    return Config().replaced({
        "loftr": {"match_coarse": {"sparse_spvs": False}},
    })


def indoor_ot() -> Config:
    """configs/loftr/indoor/loftr_ot_dense.py: dense spvs, sinkhorn."""
    return Config().replaced({
        "loftr": {"match_coarse": {"match_type": "sinkhorn",
                                   "sparse_spvs": False}},
    })


def outdoor_ds() -> Config:
    """configs/loftr/outdoor/loftr_ds_dense.py: lr 8e-3, train pct 0.3."""
    return Config().replaced({
        "loftr": {"match_coarse": {"sparse_spvs": False,
                                   "train_coarse_percent": 0.3}},
        "trainer": {"canonical_lr": 8e-3},
    })


def outdoor_ot() -> Config:
    return outdoor_ds().replaced({
        "loftr": {"match_coarse": {"match_type": "sinkhorn"}},
    })


def scannet_eval(border_rm: int = 0) -> Config:
    """configs/loftr/indoor/scannet/loftr_ds_eval.py: BORDER_RM=0 reproduces
    the paper's ScanNet numbers (auc@10=40.8 vs 39.5 with border_rm=2)."""
    return indoor_ds().replaced({
        "loftr": {"match_coarse": {"border_rm": border_rm}},
    })


def indoor_ds_buggy_pos_enc() -> Config:
    """configs/loftr/indoor/buggy_pos_enc/loftr_ds.py: TEMP_BUG_FIX=False.

    Released pre-fix checkpoints (e.g. ``indoor_ds.ckpt``) were trained with
    the buggy positional-encoding div_term (position_encoding.py:25-28);
    converting them requires this preset."""
    return indoor_ds().replaced({
        "loftr": {"coarse": {"temp_bug_fix": False}},
    })


def indoor_ot_buggy_pos_enc() -> Config:
    """configs/loftr/indoor/buggy_pos_enc/loftr_ot.py."""
    return indoor_ot().replaced({
        "loftr": {"coarse": {"temp_bug_fix": False}},
    })


def indoor_ds_turbo() -> Config:
    """TPU-turbo preset: NOT checkpoint-compatible with released weights.

    Ledger-driven architecture trim (docs/PERFORMANCE.md round-4 per-op
    ledger) — no reference counterpart; this trades model capacity for
    throughput under an accuracy guard (tools/turbo_ab.py trains default
    vs turbo on the synthetic pose-AUC benchmark, perf/turbo_ab.json):

    - ``block_dims (128, 196, 256) -> (128, 128, 256)``: the 196-channel
      middle stage is zero-padded to 256 MXU lanes on TPU anyway, so its
      convs execute at 256-width with ~41% wasted lanes (the round-4
      pad-256 A/B).  The two largest ledger blocks — the 1/2-res fine
      FusionBlock (1.08 + 0.47 ms/pair) and the layer2 stage
      (0.93 ms/pair) — are all d[1]-wide; a true-128 middle stage keeps
      every conv lane-aligned and quarters their FLOPs.
    - ``max_matches 1024 -> 512``: halves the fine-stage Pallas kernel
      (0.89 ms/pair) and window-gather (0.23 ms/pair) work, which scale
      linearly in K.

    Coarse d_model (=block_dims[2]=256) and fine d_model (=block_dims[0]
    =128) are unchanged, so every transformer/matching stage keeps the
    flagship geometry and all fused kernels engage identically.
    """
    return indoor_ds().replaced({
        "loftr": {
            "backbone": {"block_dims": (128, 128, 256)},
            "match_coarse": {"max_matches": 512},
        },
    })


PRESETS = {
    "default": default_config,
    "indoor_ds": indoor_ds,
    "indoor_ot": indoor_ot,
    "outdoor_ds": outdoor_ds,
    "outdoor_ot": outdoor_ot,
    "scannet_eval": scannet_eval,
    "indoor_ds_buggy_pos_enc": indoor_ds_buggy_pos_enc,
    "indoor_ot_buggy_pos_enc": indoor_ot_buggy_pos_enc,
    "indoor_ds_turbo": indoor_ds_turbo,
}


def get_config(name: str = "default", overrides: Mapping[str, Any] | None = None,
               ) -> Config:
    cfg = PRESETS[name]()
    if overrides:
        cfg = cfg.replaced(overrides)
    return cfg


def load_config_file(path: str) -> dict:
    """Read one nested-override dict from a .json / .yaml / .yml file.

    The file may optionally name a base preset via a top-level
    ``"preset": "<name>"`` key (consumed by :func:`get_config_from_files`,
    ignored here beyond passthrough).
    """
    import json

    with open(path) as f:
        if path.endswith((".yaml", ".yml")):
            import yaml
            data = yaml.safe_load(f)
        elif path.endswith(".json"):
            data = json.load(f)
        else:
            raise ValueError(f"unknown config format: {path} "
                             "(expected .json/.yaml/.yml)")
    if not isinstance(data, Mapping):
        raise ValueError(f"{path}: top level must be a mapping")
    return dict(data)


def get_config_from_files(*paths: str, preset: str | None = None,
                          overrides: Mapping[str, Any] | None = None,
                          fallback: str = "default") -> Config:
    """Multi-file config with the reference's merge precedence
    (train.py:63-65; configs/data/base.py:1-4): preset defaults, then each
    file in argument order (later files win — the reference merges the main
    cfg then the data cfg, data wins), then explicit ``overrides`` last.

    A file may set ``preset: <name>`` to select the base preset; the
    ``preset`` argument (e.g. from the CLI) wins over files.
    """
    dicts = [load_config_file(p) for p in paths]
    base = preset
    if base is None:
        for d in dicts:
            base = d.get("preset", base)  # later files win
    cfg = PRESETS[base or fallback]()
    for d in dicts:
        d = {k: v for k, v in d.items() if k != "preset"}
        if d:
            cfg = cfg.replaced(d)
    if overrides:
        cfg = cfg.replaced(overrides)
    return cfg
