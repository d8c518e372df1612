"""End-to-end benchmark evaluator: matcher -> epipolar errors -> pose ->
AUC aggregation.

Replaces the reference's test path (/root/reference/test.py +
src/lightning/lightning_loftr.py:205-249): per pair run the matcher, compute
symmetric epipolar errors against GT pose on device, estimate relative pose
(OpenCV parity solver or the batched JAX RANSAC), aggregate pose AUC@{5,10,20}
and precision@epi_thr.

Multi-host sharding: pair indices are split exactly (round-robin) instead of
the reference's DistributedSampler-with-padding + dedup (metrics.py:179-182);
results are merged by identifier.
"""
from __future__ import annotations

import time
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from loftr_tpu.config import Config
from loftr_tpu.data.loader import DataLoader
from loftr_tpu.eval.metrics import (aggregate_metrics, essential_from_pose,
                                    relative_pose_error,
                                    symmetric_epipolar_distance)
from loftr_tpu.eval.pose import estimate_pose_opencv
from loftr_tpu.eval.ransac import estimate_pose_ransac_jax
from loftr_tpu.models.matcher import LoFTR
from loftr_tpu.structs import MatchInput


def _merge_across_hosts(metrics: Dict[str, list]) -> Dict[str, list]:
    """Gather raw per-pair metric lists from all hosts (multi-host eval).

    Replaces the reference's pickled-object Gloo all_gather side channel
    (comm.py:141-176): under exact pair sharding each host holds disjoint
    pairs; a pickle-payload allgather (parallel/comm.py - the metric lists
    contain strings and ragged arrays, which raw process_allgather cannot
    carry) reassembles the full set before aggregation.  No-op in
    single-process runs."""
    if jax.process_count() == 1:
        return metrics
    from loftr_tpu.parallel.comm import process_allgather_objects
    merged = {k: [] for k in metrics}
    for host_metrics in process_allgather_objects(metrics):
        for k, v in host_metrics.items():
            merged[k].extend(list(v))
    return merged


class Evaluator:
    def __init__(self, config: Config, variables: dict,
                 pose_solver: str = "opencv", num_hypotheses: int = 1024,
                 fold_bn: bool = False):
        """pose_solver: 'opencv' (parity, metrics.py:72-98), 'jax'/'jax5pt'
        (batched on-device RANSAC), 'native' (in-tree C++ LO-RANSAC),
        or '5pt' (in-tree minimal 5-point hidden-variable solver).

        fold_bn: fold backbone BatchNorms into conv kernels for inference
        (utils/folding.py).  Measured perf-neutral on TPU v5e (XLA already
        fuses the eval-mode affine into the conv epilogue), so default off
        to keep eval numerics bit-identical to training; useful to shrink
        the inference param set / drop the batch_stats collection."""
        if (fold_bn and config.loftr.backbone.norm == "batch"
                and "batch_stats" in variables):
            from loftr_tpu.utils.folding import fold_batchnorm, fold_config
            variables = fold_batchnorm(variables)
            config = fold_config(config)
        self.config = config
        self.variables = variables
        self.model = LoFTR(config.loftr)
        self.pose_solver = pose_solver
        self.num_hypotheses = num_hypotheses
        self._fwd = jax.jit(lambda v, b: self.model.apply(v, b))
        self._epi = jax.jit(self._epi_fn)

    def _epi_fn(self, result, inp: MatchInput):
        E = essential_from_pose(inp.T_0to1)
        return symmetric_epipolar_distance(
            result.mkpts0_f, result.mkpts1_f, E, inp.K0, inp.K1)

    def evaluate_batches(self, batches: Iterable, rng: Optional[jax.Array] = None,
                         dump_path: Optional[str] = None,
                         figure_sink=None, n_figure_pairs: int = 8,
                         figure_conf_thr: float = 5e-4) -> Dict[str, float]:
        """batches: iterable of (MatchInput, meta-list).

        dump_path: optional .npz path for per-pair records (the reference's
        --dump_dir equivalent, lightning_loftr.py:211-228); render with
        tools/visualize_dump.py.

        figure_sink: optional callable(list_of_matplotlib_figures) invoked for
        the first `n_figure_pairs` pairs — the reference's val match-figure
        logging hook (lightning_loftr.py:194-198 -> plotting.py:112-133).
        Figures are epi-error colored; ownership (closing) passes to the sink."""
        metrics = {"identifiers": [], "R_errs": [], "t_errs": [],
                   "epi_errs": [], "n_matches": []}
        dumps = [] if dump_path else None
        figures_left = n_figure_pairs if figure_sink is not None else 0
        rng = jax.random.PRNGKey(0) if rng is None else rng
        pixel_thr = self.config.trainer.ransac_pixel_thr
        conf = self.config.trainer.ransac_conf

        for inp, meta in batches:
            inp = jax.tree.map(
                lambda x: jnp.asarray(x) if x is not None else None, inp,
                is_leaf=lambda x: x is None)
            result = self._fwd(self.variables, inp)
            epi = self._epi(result, inp)
            valid = np.asarray(result.valid)
            epi = np.asarray(epi)
            kpts0 = np.asarray(result.mkpts0_f)
            kpts1 = np.asarray(result.mkpts1_f)
            K0 = np.asarray(inp.K0)
            K1 = np.asarray(inp.K1)
            T_0to1 = np.asarray(inp.T_0to1)

            B = valid.shape[0]
            if figures_left > 0:
                from loftr_tpu.utils.plotting import make_matching_figures
                figs = make_matching_figures(
                    result, inp, epi_errs=epi, conf_thr=figure_conf_thr)
                figure_sink(figs[:figures_left])
                for f in figs[figures_left:]:  # over-quota: close, don't leak
                    import matplotlib.pyplot as plt
                    plt.close(f)
                figures_left -= min(figures_left, B)
            if self.pose_solver in ("jax", "jax5pt"):
                rng, sub = jax.random.split(rng)
                rngs = jax.random.split(sub, B)
                # 'jax5pt': on-device minimal 5-point hypotheses (each
                # sample yields up to 10 E), so far fewer samples suffice
                minimal = self.pose_solver == "jax5pt"
                n_hyp = (max(1, self.num_hypotheses // 8) if minimal
                         else self.num_hypotheses)
                est = jax.vmap(
                    lambda a, b, k0, k1, v, r: estimate_pose_ransac_jax(
                        a, b, k0, k1, v, r, pixel_thr=pixel_thr,
                        num_hypotheses=n_hyp,
                        solver="5pt" if minimal else "8pt"))(
                    jnp.asarray(kpts0), jnp.asarray(kpts1),
                    jnp.asarray(K0), jnp.asarray(K1),
                    jnp.asarray(valid), rngs)

            for b in range(B):
                v = valid[b]
                metrics["epi_errs"].append(epi[b][v])
                metrics["n_matches"].append(int(v.sum()))
                ident = f"{meta[b]['scene_id']}#{meta[b]['pair_id']}"
                metrics["identifiers"].append(ident)
                if self.pose_solver in ("opencv", "native", "5pt"):
                    if self.pose_solver == "opencv":
                        ret = estimate_pose_opencv(
                            kpts0[b][v], kpts1[b][v], K0[b], K1[b],
                            pixel_thr, conf)
                    elif self.pose_solver == "native":
                        from loftr_tpu.native import estimate_pose_native
                        ret = estimate_pose_native(
                            kpts0[b][v], kpts1[b][v], K0[b], K1[b],
                            pixel_thr, self.num_hypotheses)
                    else:
                        from loftr_tpu.eval.five_point import \
                            estimate_pose_5pt
                        ret = estimate_pose_5pt(
                            kpts0[b][v], kpts1[b][v], K0[b], K1[b],
                            pixel_thr)
                    if ret is None:
                        metrics["R_errs"].append(np.inf)
                        metrics["t_errs"].append(np.inf)
                        continue
                    R, t, _ = ret
                else:
                    if not bool(est.ok[b]):
                        metrics["R_errs"].append(np.inf)
                        metrics["t_errs"].append(np.inf)
                        continue
                    R = np.asarray(est.R[b])
                    t = np.asarray(est.t[b])
                t_err, R_err = relative_pose_error(T_0to1[b], R, t)
                metrics["R_errs"].append(R_err)
                metrics["t_errs"].append(t_err)
                if dumps is not None:
                    dumps.append({
                        "identifier": metrics["identifiers"][-1],
                        "pair_names": meta[b].get("pair_names"),
                        "mkpts0_f": kpts0[b][v], "mkpts1_f": kpts1[b][v],
                        "mconf": np.asarray(result.coarse.mconf)[b][v],
                        "epi_errs": epi[b][v],
                        "R_err": metrics["R_errs"][-1],
                        "t_err": metrics["t_errs"][-1],
                    })

        if dumps is not None:
            np.savez_compressed(
                dump_path, records=np.asarray(dumps, dtype=object))
        metrics = _merge_across_hosts(metrics)
        return aggregate_metrics(metrics, self.config.trainer.epi_err_thr)

    def evaluate_dataset(self, dataset, batch_size: int = 1,
                         num_workers: int = 4,
                         world_size: int = 1, rank: int = 0,
                         dump_path: Optional[str] = None,
                         figure_sink=None, n_figure_pairs: int = 8,
                         figure_conf_thr: float = 5e-4
                         ) -> Dict[str, float]:
        """Exact pair-index sharding across hosts (no duplicates)."""
        order = list(range(rank, len(dataset), world_size))
        loader = DataLoader(dataset, batch_size=batch_size, sampler=order,
                            num_workers=num_workers, drop_last=False)
        return self.evaluate_batches(loader, dump_path=dump_path,
                                     figure_sink=figure_sink,
                                     n_figure_pairs=n_figure_pairs,
                                     figure_conf_thr=figure_conf_thr)
