"""Training solver: epoch loop, in-loop validation, checkpointing,
telemetry.

TPU-native rework of reference lib/solver.py:80-697 (class Solver):
  * the per-iter work is one compiled pjit step (train/step.py) instead
    of eager forward/loss/backward;
  * fetch vs step time telemetry is kept (host input pipeline vs device,
    reference :464-505) plus ETA extrapolation;
  * validation every ``val_step`` iterations runs the shared-forward
    caption evaluator (eval/eval_helper.py) on the val loader and keeps
    the best checkpoint by ``criterion`` (default CIDEr, :556-580);
  * ``model_last`` is written each epoch, asynchronously; interrupts
    save the previous-epoch snapshot (:237-240, :582-594);
  * BN-momentum schedule for detection pretraining: momentum
    0.5 * 0.5^(epoch // 20), floor 0.001 (:179-187).
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from spacap3d_tpu.config import RunConfig
from spacap3d_tpu.eval.eval_helper import eval_cap
from spacap3d_tpu.parallel.mesh import shard_batch
from spacap3d_tpu.parallel.tp import shard_params, tp_degree
from spacap3d_tpu.train.step import (
    TrainState,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from spacap3d_tpu.utils.checkpoint import AsyncCheckpointer, load_checkpoint
from spacap3d_tpu.utils.logging import RunLogger, decode_eta

BN_MOMENTUM_INIT = 0.5
BN_MOMENTUM_MAX = 0.001


class _NullLogger:
    """Logger stub for non-zero processes in a multi-host run: process 0
    owns log.txt/all_scalars.json/best.txt; the others run the identical
    loop silently (their metric streams are bit-identical anyway)."""

    def log(self, *a, **k):
        pass

    def scalar(self, *a, **k):
        pass

    def write_json(self, *a, **k):
        pass

    def dump_scalars(self, *a, **k):
        pass

    def close(self, *a, **k):
        pass


class Solver:
    def __init__(
        self,
        run_cfg: RunConfig,
        params, state,
        train_loader,
        val_loader,
        train_dataset,
        val_dataset,
        vocab,
        dataset_config,
        corpus_annotations,
        stamp: str,
        mesh=None,
        start_epoch: int = 0,
        checkpoint_best: Optional[Dict] = None,
        eval_on_train: bool = False,
        meteor_jar: Optional[str] = None,
        train_eval_loader=None,
        train_eval_dataset=None,
        train_corpus_annotations=None,
    ):
        self.cfg = run_cfg
        self.tc = run_cfg.train
        self.mc = run_cfg.model
        self.mesh = mesh
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.vocab = vocab
        self.dc = dataset_config
        self.corpus_annotations = corpus_annotations
        self.stamp = stamp
        self.start_epoch = start_epoch
        self.eval_on_train = eval_on_train
        self.meteor_jar = meteor_jar
        self.train_eval_loader = train_eval_loader
        self.train_eval_dataset = train_eval_dataset
        self.train_corpus_annotations = train_corpus_annotations

        self.root = os.path.join(run_cfg.output_dir, stamp)
        # Multi-host (parallel/multihost.py): every process runs the same
        # epoch loop on the same global train step (its DataLoader builds
        # only the local row-block of each global batch; _to_device
        # assembles the globally-sharded batch). In-loop validation runs
        # redundantly per process on local devices — deterministic, so
        # every process reaches the identical best-ckpt decision — and
        # only process 0 touches the filesystem (logs + checkpoints).
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        if self.process_count > 1 and tp_degree(mesh) > 1:
            raise NotImplementedError(
                "tensor parallelism (--tp) is single-process; multi-host "
                "runs are data-parallel only (docs/SCALING.md)")
        self.logger = (RunLogger(self.root) if self.process_index == 0
                       else _NullLogger())
        self.ckpt = AsyncCheckpointer()

        steps_per_epoch = len(train_loader)
        tp = tp_degree(mesh)
        if tp > 1:
            # Tensor parallelism (parallel/tp.py): commit the captioner
            # blocks to the ``model`` axis BEFORE tx.init so the Adam
            # moments (zeros_like) inherit the layout. The flat-grouped
            # optimizer would concatenate mixed-layout leaves into one
            # vector, so TP runs the per-leaf chain (same updates,
            # equality-tested in tests/test_train_e2e.py).
            from jax.sharding import NamedSharding, PartitionSpec as P

            params = shard_params(mesh, params)
            state = jax.device_put(state, NamedSharding(mesh, P()))
        self.tx = make_optimizer(params, self.tc, steps_per_epoch,
                                 flat=(tp == 1))
        self.train_state = init_train_state(params, state, self.tx)
        self.train_step = make_train_step(
            self.mc, self.tc, self.tx, mesh=mesh, donate=True
        )
        # multi-host: eval on LOCAL devices per process (plain jit; each
        # process sees full val batches, mesh placement would expect
        # local row-blocks)
        self.eval_step = make_eval_step(
            self.mc, mesh=mesh if self.process_count == 1 else None)

        self.best = checkpoint_best or {
            "epoch": 0, "bleu-1": -float("inf"), "bleu-2": -float("inf"),
            "bleu-3": -float("inf"), "bleu-4": -float("inf"),
            "cider": -float("inf"), "rouge": -float("inf"),
            "meteor": -float("inf"), "sum": -float("inf"),
        }
        self.global_iter = 0
        self._prev_snapshot = None
        self._timing = {"fetch": [], "step": []}

    # ------------------------------------------------------------------
    def bn_momentum(self, epoch: int) -> float:
        if not self.tc.no_caption:
            return 0.1  # torch default; only detection pretraining schedules it
        m = BN_MOMENTUM_INIT * (self.tc.bn_decay_rate ** (epoch // self.tc.bn_decay_step))
        return max(m, BN_MOMENTUM_MAX)

    def _to_device(self, batch):
        if self.process_count > 1:
            # ``batch`` is this process's local row-block (DataLoader
            # process slicing); assemble the globally-sharded batch
            from spacap3d_tpu.parallel.multihost import global_batch_from_local

            return global_batch_from_local(self.mesh, batch)
        if self.mesh is not None:
            return shard_batch(self.mesh, batch)
        return batch

    def _eval_to_device(self, batch):
        """Validation placement: under multi-host the eval step is a
        process-local jit over full batches, so no mesh placement."""
        if self.process_count > 1:
            return batch
        return self._to_device(batch)

    def _save(self, name: str, epoch: int):
        if self.process_index != 0:
            return None  # process 0 owns the filesystem (params replicated)
        payload = {
            "epoch": epoch,
            "iter": self.global_iter,
            "params": self.train_state.params,
            "state": self.train_state.state,
            "opt_state": self.train_state.opt_state,
            "step": self.train_state.step,
            "best": dict(self.best),
            "config": None,
        }
        self.ckpt.save(os.path.join(self.root, name), payload)
        return payload

    def restore(self, path: str):
        payload = load_checkpoint(path)
        from spacap3d_tpu.utils.convert import np_to_jax

        params = np_to_jax(payload["params"])
        state = np_to_jax(payload["state"])
        opt = np_to_jax(payload["opt_state"])
        if tp_degree(self.mesh) > 1:
            # Re-commit the TP layout: checkpoints snapshot to host numpy,
            # so a restored-under-TP run must place the captioner shards
            # back on the ``model`` axis. The optimizer state mirrors the
            # param tree inside optax's structures — a fresh tx.init on
            # the placed params is a sharding template with the identical
            # treedef, so place each loaded leaf where its twin lives.
            from jax.sharding import NamedSharding, PartitionSpec as P

            params = shard_params(self.mesh, params)
            state = jax.device_put(state, NamedSharding(self.mesh, P()))
            template = self.tx.init(params)
            opt = jax.tree_util.tree_map(
                lambda x, t: jax.device_put(x, t.sharding), opt, template
            )
        self.train_state = TrainState(params, state, opt, payload["step"])
        # checkpoint snapshots pass every leaf through np.asarray — cast
        # the python-scalar bookkeeping back to native types, or the 0-d
        # arrays poison json.dump in dump_scalars / info.json later
        self.best = {
            k: int(v) if k == "epoch" else float(v)
            for k, v in payload["best"].items()
        }
        self.global_iter = int(payload["iter"])
        self.start_epoch = int(payload["epoch"]) + 1

    # ------------------------------------------------------------------
    def profile(self, num_steps: int = 5, rng=None):
        """Capture a jax.profiler device trace of a few train steps into
        <run>/profile (the TPU-native upgrade of the reference's
        hand-rolled wall-clock telemetry, lib/solver.py:464-505).
        View with tensorboard or xprof."""
        trace_dir = os.path.join(self.root, "profile")
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        batch = next(iter(self.train_loader))
        dev_batch = self._to_device(batch)
        # warmup/compile outside the trace
        ts, _ = self.train_step(self.train_state, dev_batch, rng, 0.1)
        with jax.profiler.trace(trace_dir):
            for i in range(num_steps):
                ts, _ = self.train_step(ts, dev_batch,
                                        jax.random.fold_in(rng, i), 0.1)
            jax.block_until_ready(ts.params)
        self.train_state = ts
        self.logger.log(f"profiler trace written to {trace_dir}")
        return trace_dir

    # ------------------------------------------------------------------
    def __call__(self, epochs: int, verbose: int = 1000):
        total_iters = len(self.train_loader) * epochs
        rng = jax.random.PRNGKey(self.tc.seed)
        t_start = time.time()
        try:
            for epoch in range(self.start_epoch, epochs):
                self.logger.log(f"epoch {epoch + 1} starting...")
                momentum = self.bn_momentum(epoch)
                self._feed_epoch(epoch, rng, momentum, verbose, total_iters, t_start)
                if (epoch + 1) % self.tc.ckpt_every == 0 or epoch == epochs - 1:
                    self._save("model_last.ckpt", epoch)
                    self._prev_snapshot = ("model_last.ckpt", epoch)
        except KeyboardInterrupt:
            self.logger.log("interrupted; saving previous-epoch snapshot...")
            self.ckpt.wait()
            self.logger.dump_scalars()
            raise
        self.ckpt.wait()
        self._finish()

    def _feed_epoch(self, epoch, rng, momentum, verbose, total_iters, t_start):
        # pin the loader's shuffle epoch to the TRUE epoch index so a
        # --use_checkpoint restart resumes with the same batch order an
        # uninterrupted run would have seen (the loader otherwise counts
        # its own __iter__ calls from 0) — bit-compatible resume
        if hasattr(self.train_loader, "epoch"):
            self.train_loader.epoch = epoch
        # step-time sampling period: blocking every iteration would kill
        # the dispatch pipeline, so device step time is bounded with
        # block_until_ready on sampled iterations only (the reference
        # logged every iter's forward/backward/iter time eagerly,
        # lib/solver.py:464-505 — eager torch had no pipeline to lose)
        sample_every = max(1, min(verbose, 50))
        epoch_fetch, epoch_step = [], []
        epoch_t0 = time.time()
        n_iters = 0
        fetch_t0 = time.time()
        for batch in self.train_loader:
            step_rng = jax.random.fold_in(rng, self.global_iter)
            dev_batch = self._to_device(batch)
            fetch_time = time.time() - fetch_t0

            t0 = time.time()
            self.train_state, metrics = self.train_step(
                self.train_state, dev_batch, step_rng, momentum
            )
            sampled = (self.global_iter % sample_every == 0)
            if sampled:
                jax.block_until_ready(metrics)
                step_time = time.time() - t0
                epoch_step.append(step_time)
                self._timing["step"].append(step_time)
            if (self.global_iter + 1) % verbose == 0 or self.global_iter == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                step_time = time.time() - t0
                self._report(epoch, metrics, fetch_time, step_time,
                             total_iters, t_start)
                for k, v in metrics.items():
                    self.logger.scalar("train", k, v, self.global_iter)
            epoch_fetch.append(fetch_time)
            self._timing["fetch"].append(fetch_time)

            self.global_iter += 1
            n_iters += 1
            if self.tc.val_step and self.global_iter % self.tc.val_step == 0:
                self._validate(epoch)
            fetch_t0 = time.time()
        epoch_wall = time.time() - epoch_t0
        if n_iters:
            mean_fetch = float(np.mean(epoch_fetch)) * 1000
            mean_step = float(np.mean(epoch_step)) * 1000 if epoch_step else 0.0
            self.logger.log(
                f"epoch {epoch + 1} done | {n_iters} iters in "
                f"{epoch_wall:.1f}s ({epoch_wall / n_iters * 1000:.0f}ms/iter) "
                f"| mean fetch {mean_fetch:.0f}ms | mean step {mean_step:.0f}ms "
                f"(blocked, {len(epoch_step)} samples)"
            )
            self.logger.scalar("train", "mean_fetch_ms", mean_fetch,
                               self.global_iter)
            self.logger.scalar("train", "mean_step_ms", mean_step,
                               self.global_iter)

    def _report(self, epoch, metrics, fetch_time, step_time, total_iters, t_start):
        done = max(self.global_iter, 1)
        eta = decode_eta((time.time() - t_start) / done * (total_iters - done))
        parts = [f"epoch {epoch + 1} iter {self.global_iter}/{total_iters}"]
        for k in ("loss", "det_loss", "cap_loss", "relation_loss", "cap_acc", "obj_acc"):
            if k in metrics:
                parts.append(f"{k} {metrics[k]:.4f}")
        parts.append(f"fetch {fetch_time * 1000:.0f}ms step {step_time * 1000:.0f}ms")
        parts.append(f"eta {eta['h']}h{eta['m']}m")
        self.logger.log(" | ".join(parts))

    # ------------------------------------------------------------------
    def _validate(self, epoch):
        if self.tc.no_caption or self.val_loader is None:
            return
        # pin the val (and eval-on-train) loaders' shuffle/subsample epoch
        # to the VALIDATION COUNT — derived from global_iter, so a
        # --use_checkpoint restart validates on the same point subsamples
        # an uninterrupted run would have seen (the loaders otherwise
        # count their own __iter__ calls from 0), keeping the best-ckpt
        # selection resume-compatible, not just the train stream
        if self.tc.val_step:
            val_idx = max(0, self.global_iter // self.tc.val_step - 1)
            for loader in (self.val_loader, self.train_eval_loader):
                if loader is not None and hasattr(loader, "epoch"):
                    loader.epoch = val_idx
        # optional eval on the train split (reference --eval_on_train,
        # lib/solver.py:511-540 runs eval_cap on both loaders)
        # only process 0 writes eval artifacts (multi-host: every process
        # validates redundantly and identically; see __init__ note)
        write_files = self.process_index == 0
        val_params = self.train_state.params
        val_state = self.train_state.state
        if self.process_count > 1:
            # after the first train step the params/state are committed to
            # the GLOBAL multi-process mesh; the eval step is a plain
            # process-local jit (see __init__), so feeding the committed
            # arrays directly would place the computation on a device set
            # spanning non-addressable devices. They are replicated
            # (out_shardings P()), so every process holds a full
            # addressable copy — pull to host once per validation and let
            # the local jit re-place them on local devices.
            val_params = jax.tree_util.tree_map(np.asarray, val_params)
            val_state = jax.tree_util.tree_map(np.asarray, val_state)
        if self.eval_on_train and self.train_eval_loader is not None:
            self.logger.log("evaluating on train split...")
            train_metrics, _ = eval_cap(
                self.eval_step, val_params, val_state,
                self.train_eval_dataset, self.train_eval_loader, self.vocab,
                self.dc, self.train_corpus_annotations,
                corpus_cache=os.path.join(self.root, "corpus_train.json")
                if write_files else None,
                pred_path=os.path.join(self.root, "pred_train.json")
                if write_files else None,
                batch_to_device=self._eval_to_device,
                meteor_jar=self.meteor_jar,
            )
            for k, v in train_metrics.items():
                if isinstance(v, (int, float)):
                    self.logger.scalar("train", f"eval_{k}", v, self.global_iter)
        self.logger.log("validating...")
        metrics, _ = eval_cap(
            self.eval_step, val_params, val_state,
            self.val_dataset, self.val_loader, self.vocab, self.dc,
            self.corpus_annotations,
            corpus_cache=os.path.join(self.root, "corpus_val.json")
            if write_files else None,
            pred_path=os.path.join(self.root, "pred_val.json")
            if write_files else None,
            batch_to_device=self._eval_to_device,
            meteor_jar=self.meteor_jar,
        )
        for k, v in metrics.items():
            if isinstance(v, (int, float)):
                self.logger.scalar("val", k, v, self.global_iter)
        crit = self.tc.criterion
        if crit == "sum":
            cur = sum(metrics[k] for k in ("bleu-4", "cider", "rouge", "meteor"))
        else:
            cur = metrics[crit]
        self.logger.log(
            "val: " + " ".join(f"{k}={metrics[k]:.4f}" for k in
                               ("bleu-4", "cider", "rouge", "meteor"))
        )
        if cur > self.best[crit]:
            self.logger.log(f"new best {crit}: {cur:.4f} (epoch {epoch + 1})")
            self.best.update(
                {k: metrics.get(k, self.best.get(k)) for k in
                 ("bleu-1", "bleu-2", "bleu-3", "bleu-4", "cider", "rouge", "meteor")}
            )
            self.best["epoch"] = epoch + 1
            self.best["sum"] = sum(
                metrics[k] for k in ("bleu-4", "cider", "rouge", "meteor")
            )
            self._save("model.ckpt", epoch)

    def _finish(self):
        if self.process_index != 0:
            self.logger.close()
            return
        with open(os.path.join(self.root, "best.txt"), "w") as f:
            for k, v in self.best.items():
                f.write(f"{k}: {v}\n")
        self.logger.write_json("best.json", self.best)
        self.logger.close()
