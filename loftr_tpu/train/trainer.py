"""Training orchestration: state, jitted train/eval steps, mesh sharding.

Replaces the reference's PyTorch-Lightning module
(/root/reference/src/lightning/lightning_loftr.py:82-133) with pure jitted
functions over an explicit TrainState.  One training step =
coarse supervision -> forward (train selection) -> fine supervision -> loss
-> grads -> clip -> optimizer update (lightning_loftr.py:84-93), compiled as
a single XLA program; under a data-sharded batch the gradient psum rides ICI
(the DDP all-reduce equivalent).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from loftr_tpu.config import Config
from loftr_tpu.losses import loftr_loss
from loftr_tpu.models.matcher import LoFTR
from loftr_tpu.structs import MatchInput, MatchResult
from loftr_tpu.supervision import coarse_supervision, fine_supervision
from loftr_tpu.train.optim import build_optimizer


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


class Trainer:
    """Owns the model + optimizer and builds the jitted step functions.

    Usage:
      trainer = Trainer(config, world_size=mesh.shape['data'], bs_per_device=1)
      state = trainer.init_state(rng, example_batch)
      state, scalars = trainer.train_step(state, batch)
    """

    def __init__(self, config: Config, world_size: int = 1,
                 batch_size_per_device: int = 1):
        if world_size > 1:
            # shard-local two-image packing under data parallelism: the
            # reference's batch-axis concat makes GSPMD reshard 1.5 GB of
            # activations per step (ops/packing.py, perf/scaling_model.json)
            config = config.replaced(
                {"loftr": {"batch_packing": "interleave"}})
        self.config = config
        self.model = LoFTR(config.loftr)
        # val loss needs the materialized conf matrix; the fused Pallas
        # inference matcher (default for deployment) never builds it, so
        # validation runs the XLA oracle path (identical param tree)
        self.val_model = LoFTR(config.replaced({"loftr": {
            "match_coarse": {"use_pallas": False},
            "fine": {"use_pallas": False}}}).loftr)
        true_lr, warmup = config.scaled_lr(world_size, batch_size_per_device)
        self.tx = build_optimizer(config.trainer, true_lr, warmup)
        # gradient accumulation: apply the optimizer once per accum_steps
        # micro-batches (grads averaged by MultiSteps); the inner schedule
        # (warmup/decay) advances once per REAL update, matching the
        # reference's per-optimizer-step warmup (lightning_loftr.py:60-80)
        self._accum = max(1, config.trainer.accum_steps)
        if self._accum > 1:
            self.tx = optax.MultiSteps(self.tx, every_k_schedule=self._accum)
        # per-step LR in the scalars (LearningRateMonitor equivalent,
        # train.py:98)
        from loftr_tpu.train.optim import lr_schedule
        self._lr_sched = lr_schedule(config.trainer, true_lr, warmup)
        self._res_c, self._res_f = config.loftr.backbone.resolution
        self._window = config.loftr.fine.window_size

    # ---------------------------------------------------------------- init
    def init_state(self, rng: jax.Array, example: MatchInput) -> TrainState:
        init_rng, state_rng = jax.random.split(rng)
        variables = self.model.init(init_rng, example)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            rng=state_rng,
        )

    # ---------------------------------------------------------------- step
    def _train_step(self, state: TrainState, batch: MatchInput
                    ) -> Tuple[TrainState, dict]:
        rng, sel_rng = jax.random.split(state.rng)
        spv = coarse_supervision(batch, self._res_c)

        def loss_fn(params):
            out, mutated = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, rng=sel_rng,
                gt_j=spv.gt_j, gt_valid=spv.gt_valid,
                mutable=["batch_stats"])
            expec_f_gt = fine_supervision(spv, out.coarse, batch,
                                          self._res_f, self._window)
            loss, scalars = loftr_loss(out, spv, expec_f_gt, batch,
                                       self.config.loftr.loss,
                                       self.config.loftr.match_coarse)
            return loss, (scalars, mutated["batch_stats"])

        grads, (scalars, new_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        scalars = dict(scalars)
        scalars["grad_norm"] = optax.global_norm(grads)
        # state.step counts micro-steps; the schedule advances per real
        # optimizer update (every accum_steps micro-steps)
        scalars["lr"] = self._lr_sched(state.step // self._accum)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt,
                               rng=rng)
        return new_state, scalars

    def _eval_step(self, state: TrainState, batch: MatchInput) -> MatchResult:
        return self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, batch)

    def _val_step(self, state: TrainState, batch: MatchInput):
        """Validation: eval-mode forward + loss on GT supervision
        (lightning_loftr.py:135-156 semantics - loss computed on the top-K
        predicted matches with slot masks, no GT padding)."""
        spv = coarse_supervision(batch, self._res_c)
        out = self.val_model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, batch)
        expec_f_gt = fine_supervision(spv, out.coarse, batch,
                                      self._res_f, self._window)
        loss, scalars = loftr_loss(out, spv, expec_f_gt, batch,
                                   self.config.loftr.loss,
                                   self.config.loftr.match_coarse)
        return out, scalars

    # jitted entry points -------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def train_step(self, state, batch):
        return self._train_step(state, batch)

    @partial(jax.jit, static_argnums=0)
    def eval_step(self, state, batch):
        return self._eval_step(state, batch)

    @partial(jax.jit, static_argnums=0)
    def val_step(self, state, batch):
        return self._val_step(state, batch)
