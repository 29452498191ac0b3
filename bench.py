"""Benchmark: eval + train throughput and MFU of the flagship model on TPU.

Headline metric (for vs_baseline continuity): scenes/sec of the
evaluation forward — detector trunk (40,000 points -> 256 proposals)
PLUS the greedy caption decode over all 256 proposals (31 steps,
KV-cached bf16 lax.scan) at the reference workload shape (batch 8,
d_model 128, 6+6 transformer layers, vocab ~4.5k).

Also reported in the same JSON line:
  * train_scenes_per_sec — full train step (fwd+bwd+Adam) at batch 8;
  * achieved TFLOP/s and MFU for both (FLOPs from XLA cost analysis,
    peak from the device kind);
  * mul_eval_e2e_rows_per_sec — END-TO-END grid mul_eval throughput on a
    synthetic 141-scene val split (host preprocessing, device forward,
    NMS/IoU matching, caption decode and capeval scoring included).

Baseline derivations (BASELINE.md, all on 1x RTX 2080Ti):
  * eval: full --mul_eval (100 seeds, caption + detection) ~4 h; per seed
    TWO full passes over 141 scenes (scripts/eval.py:462-463):
    100*2*141/14400 s = 1.96 scenes/s. Our single shared pass produces
    both outputs, so scenes/s is directly comparable (conservative: ours
    always includes the 31-step decode).
  * train: ~33 h 22 m / 50 epochs on ScanRefer (README.md:177),
    36,665 train annotations -> 4584 steps/epoch at batch 8
    => ~1.9 steps/s ~= 15.3 scenes/s.
  * mul_eval end-to-end: 282 rows (141 scenes x 2 seeds) at the
    reference's 1.96 rows/s (host scoring included in its 4 h).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Timing methodology: independent dispatches (varied inputs), pipelined,
one block at the end — dependent-chain wall time through the axon tunnel
would include ~80 ms/step round-trip that a local TPU does not pay.

Every phase runs its timed window REPEATS times and reports
{median, min, max} alongside the headline (median) value, plus the
host's loadavg at start — so a slow run can be attributed (host/tunnel
contention vs a real regression) and README claims can state the
observed band instead of a lucky point sample. The e2e phase clears the
per-scene feature cache between repeats, so each repeat is a full COLD
grid run (table build + feature assembly included), matching what a
fresh `python bench.py` or the driver reproduces.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_EVAL_SCENES_PER_SEC = 28200 / (4 * 3600.0)   # 1.958
BASELINE_TRAIN_SCENES_PER_SEC = 36665 * 50 / (33 * 3600 + 22 * 60.0)  # 15.26

# bf16 peak FLOP/s per chip by device kind substring
_PEAK = [("v6", 918e12), ("v5p", 459e12), ("v5", 197e12), ("v4", 275e12)]


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for sub, peak in _PEAK:
        if sub in kind:
            return peak
    return 197e12


def _cost_flops(compiled) -> float:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _stats(vals, ndigits=3):
    """{median,min,max,n} over per-repeat values (the variance band)."""
    return {"median": round(float(np.median(vals)), ndigits),
            "min": round(float(np.min(vals)), ndigits),
            "max": round(float(np.max(vals)), ndigits),
            "n": len(vals)}


def bench_eval(cfg, dc, params, state, batch_size=8, n_iters=10, repeats=3):
    """The PRODUCTION eval step (train/step.py make_eval_step): full
    detector trunk + 256-way KV-cached greedy decode + the
    objectness/assignment side-outputs the host harness consumes."""
    from spacap3d_tpu.train.step import make_eval_step

    rng = np.random.RandomState(0)
    pts = rng.rand(batch_size, cfg.num_points, 3).astype(np.float32) * 6.0
    pts[..., 2] *= 0.5
    height = pts[..., 2:3] - np.percentile(pts[..., 2], 0.99)
    point_clouds = jnp.asarray(np.concatenate([pts, height], -1))
    center_label = jnp.asarray(rng.rand(batch_size, 128, 3).astype(np.float32) * 6.0)

    step = make_eval_step(cfg)

    # one AOT compile serves both the FLOP count and every call below
    # (calling the jit fn would compile the same program a second time)
    lowered = step.lower(params, state, {"point_clouds": point_clouds,
                                         "center_label": center_label})
    compiled = lowered.compile()
    flops = _cost_flops(compiled)

    def eval_forward(pc):
        return compiled(params, state,
                        {"point_clouds": pc, "center_label": center_label})

    # several varied-input warm-up executions: the first executions of a
    # fresh program through the tunnel carry a one-time ~300 ms overhead
    # beyond compilation that would otherwise pollute the timed window
    for w in range(3):
        out = eval_forward(point_clouds + jnp.float32(w) * 1e-4)
        _ = np.asarray(out["lang_cap"][0, 0])

    # vary inputs per iteration (rules out request-level caching). Timing:
    # dispatch every iter, then fetch a small slice of the LAST output —
    # device execution is in-order, so the last completing implies all
    # completed. (jax.block_until_ready can return early through the
    # remote-attached-TPU tunnel, so it is NOT used for timing here.)
    # The window runs `repeats` times; callers report the median band.
    sps = []
    for rep in range(repeats):
        variants = [point_clouds + jnp.float32(rep * n_iters + i) * 1e-3
                    for i in range(n_iters)]
        for v in variants:
            np.asarray(v[0, 0])
        t0 = time.perf_counter()
        outs = [eval_forward(v) for v in variants]
        _ = np.asarray(outs[-1]["lang_cap"][0, :2])
        dt = time.perf_counter() - t0
        sps.append(batch_size * n_iters / dt)
        del outs  # free the n_iters in-flight output trees before the
        # next repeat (same HBM-leftover hazard bench_train guards)
    med_dt = batch_size * n_iters / float(np.median(sps))
    return sps, flops / (med_dt / n_iters)


def bench_train(cfg, dc, params, state, batch_size=8, n_iters=10, repeats=3):
    from spacap3d_tpu.config import TrainConfig
    from spacap3d_tpu.data.synthetic import synthetic_batch
    from spacap3d_tpu.train.step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    tc = TrainConfig(batch_size=batch_size, use_relation=True)
    batch, _, _ = synthetic_batch(cfg, batch_size=batch_size,
                                  vocab_size=cfg.vocab_size)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    tx = make_optimizer(params, tc, steps_per_epoch=4584)
    ts = init_train_state(params, state, tx)
    step = make_train_step(cfg, tc, tx)

    base_rng = jax.random.PRNGKey(7)
    lowered = step.lower(ts, batch, base_rng, 0.1)
    compiled = lowered.compile()
    flops = _cost_flops(compiled)
    step = compiled  # reuse the AOT executable (avoids a second compile)

    for w in range(3):
        ts2, metrics = step(ts, batch, jax.random.fold_in(base_rng, 1000 + w),
                            0.1)
        loss0 = float(metrics["loss"])   # forces completion

    # independent dispatches from the same state (varied rng): measures
    # step throughput without paying the tunnel round-trip per step.
    # Completion forced by fetching the last step's loss (in-order queue),
    # not block_until_ready (unreliable through the tunnel).
    sps = []
    for rep in range(repeats):
        rngs = [jax.random.fold_in(base_rng, rep * n_iters + i)
                for i in range(n_iters)]
        for r in rngs:
            np.asarray(r)
        t0 = time.perf_counter()
        outs = [step(ts, batch, r, 0.1) for r in rngs]
        _ = float(outs[-1][1]["loss"])
        dt = time.perf_counter() - t0
        sps.append(batch_size * n_iters / dt)
        del outs
    med_dt = batch_size * n_iters / float(np.median(sps))
    return sps, flops / (med_dt / n_iters), loss0


def bench_mul_eval_e2e(cfg, dc, num_scenes=141, num_seeds=4, batch_size=8,
                       repeats=3):
    """End-to-end grid mul_eval on a synthetic val split: includes host
    preprocessing, sharded device forward, NMS/IoU matching, caption
    decode and per-seed capeval scoring.

    num_seeds=4 (vs the protocol's 100) keeps the bench short while
    still amortizing the one-time per-scene feature cache the way a real
    run does; the reported rows/s is therefore conservative vs a full
    100-seed run (whose first-seed build cost is 1% instead of 25%)."""
    import dataclasses

    from spacap3d_tpu.config import DataConfig
    from spacap3d_tpu.data.dataset import ScanReferDataset, Scene, SceneStore
    from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig
    from spacap3d_tpu.data.synthetic import make_annotations, make_scene
    from spacap3d_tpu.data.vocabulary import Vocabulary
    from spacap3d_tpu.eval.eval_helper import (
        organize_annotations,
        prepare_corpus,
    )
    from spacap3d_tpu.eval.mul_eval import mul_eval_grid
    from spacap3d_tpu.train.step import make_eval_step

    rng = np.random.RandomState(3)
    store = SceneStore.__new__(SceneStore)
    store.scenes = {}
    anns = []
    for s in range(num_scenes):
        sid = f"scene{s:04d}_00"
        arrays = make_scene(rng, num_objects=6, dc=dc)
        store.scenes[sid] = Scene(
            mesh_vertices=arrays["aligned_vert"],
            instance_labels=arrays["ins_label"],
            semantic_labels=arrays["sem_label"],
            instance_bboxes=arrays["aligned_bbox"],
            relations=None,
        )
        anns += make_annotations(rng, sid, arrays["aligned_bbox"],
                                 anns_per_object=1, dc=dc)
    vocab = Vocabulary.build(anns)
    data_cfg = DataConfig(num_points=cfg.num_points, augment=False,
                          use_relation=False)
    eval_list, seen = [], set()
    for a in anns:
        if a["scene_id"] not in seen:
            seen.add(a["scene_id"])
            eval_list.append(a)
    ds = ScanReferDataset(eval_list, store, vocab, dc, data_cfg, split="val")

    # the bench model's vocab differs from the synthetic vocab: rebuild the
    # captioner head size via config (decode quality is irrelevant here)
    cfg = dataclasses.replace(cfg, vocab_size=len(vocab))
    import jax as _jax

    from spacap3d_tpu.models import init_spacap
    params, state = init_spacap(_jax.random.PRNGKey(0), cfg, dc.mean_size_arr)
    # bias objectness so NMS / caption paths do real work (a random init
    # argmaxes objectness to 0 and would skip all host post-processing)
    bias = np.asarray(params["proposal"]["conv2"]["bias"]).copy()
    bias[1] += 2.0
    params["proposal"]["conv2"]["bias"] = jnp.asarray(bias)

    eval_step = make_eval_step(cfg, compact=True)  # the grid-mode step
    corpus = prepare_corpus(anns)
    organized = organize_annotations(anns)
    seeds = list(range(num_seeds))

    # compile + first-execution warm-up OUTSIDE the timed window: a real
    # 100-seed run amortizes the one-time compile over 14100 rows; this
    # bench covers num_seeds*num_scenes rows, so timing the compile would
    # understate steady-state throughput (and add minutes of cold-cache
    # variance)
    # the grid runs in indices mode (device-resident point table), so warm
    # with that exact input signature: build the tables once here (same
    # shapes/dtypes as the in-window build), compile, then clear the
    # dataset's per-scene cache so the timed window still pays the real
    # one-time feature-assembly + table build the way a cold run does
    from spacap3d_tpu.eval.mul_eval import _build_point_tables
    tbl, ctr, _row = _build_point_tables(ds)
    warm = {
        "pc_choices": jnp.zeros((batch_size, cfg.num_points), jnp.uint16),
        "scene_row": jnp.zeros((batch_size,), jnp.int32),
        "point_table": tbl, "center_table": ctr,
    }
    out = eval_step(params, state, warm)
    _ = np.asarray(out["lang_cap"][0, 0])
    del warm, tbl, ctr
    ds._eval_cache.clear()
    ds._eval_cache_bytes = 0

    # each repeat is a COLD grid run: the per-scene feature cache (and so
    # the point-table build) is cleared between repeats, matching what a
    # fresh `python bench.py` pays — the band is over cold runs, not a
    # warm-cache best case
    import sys
    rps, timings = [], []
    for _rep in range(repeats):
        ds._eval_cache.clear()
        ds._eval_cache_bytes = 0
        timing = {}
        t0 = time.perf_counter()
        rows = mul_eval_grid(
            eval_step, params, state, ds, vocab, dc, corpus, organized,
            seeds, batch_size, also_detection=True,
            num_workers=8, score_workers=min(8, num_seeds),
            timing_out=timing,
        )
        dt = time.perf_counter() - t0
        assert len(rows) == num_seeds
        # phase breakdown rides along in the JSON so a slow run can be
        # attributed (host/tunnel interference vs regression): stream_s is
        # the wall of the overlapped loader+device+postprocess pipeline,
        # consume_s sums pool-thread time (includes device_get blocking,
        # can exceed wall), score_s is the post-stream scoring tail.
        timing["total_s"] = dt
        timing["num_seeds"] = num_seeds
        print(f"e2e repeat {_rep}: {num_scenes * num_seeds / dt:.1f} rows/s "
              f"phases: {timing}", file=sys.stderr)
        rps.append(num_scenes * num_seeds / dt)
        timings.append(timing)
    # report the MEDIAN repeat's phases (the headline is the median
    # rows/s — an outlier repeat's breakdown would not explain it)
    med_idx = int(np.argsort(rps)[len(rps) // 2])
    return rps, timings[med_idx]


def main():
    import os

    from spacap3d_tpu.utils.logging import enable_compilation_cache
    enable_compilation_cache()

    from spacap3d_tpu.config import ModelConfig
    from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig
    from spacap3d_tpu.models import init_spacap

    smoke = bool(os.environ.get("SPACAP_BENCH_SMOKE"))  # CPU correctness run
    if smoke:
        cfg = ModelConfig(
            num_points=1024, num_proposals=16, num_layers=2, num_heads=4,
            d_model=32, d_ff=64, max_des_len=7, vocab_size=64,
            sa_npoints=(128, 64, 32, 16), sa_nsamples=(16, 8, 8, 4),
            sa_widths=((16, 16, 32), (32, 32, 64), (32, 32, 64), (32, 32, 64)),
            fp_width=64, seed_feature_dim=64, proposal_feature_dim=32,
        )
    else:
        cfg = ModelConfig(num_points=40000, vocab_size=4528)
    dc = ScannetDatasetConfig()
    params, state = init_spacap(jax.random.PRNGKey(0), cfg, dc.mean_size_arr)

    dev = jax.devices()[0]
    peak = _peak_flops(dev)
    # host-contention indicator captured BEFORE the bench adds its own
    # load: a high starting loadavg explains a low e2e band (the grid's
    # host pipeline shares cores with whatever else runs on this machine)
    try:
        loadavg_start = round(os.getloadavg()[0], 2)
    except OSError:
        loadavg_start = None

    n_iters = 4 if smoke else 20
    repeats = 2 if smoke else 3

    # Degraded-tunnel guard: the remote-attached TPU occasionally enters a
    # globally slow window (observed: a ~20-minute session where eval,
    # train AND e2e all ran ~25x under their device-bound medians with
    # near-zero variance and loadavg 0 — an environmental outage, not a
    # code regression; the same process measured full speed minutes
    # later). EVERY phase whose median lands implausibly far below its
    # device-bound floor is retried after a backoff (a window can open
    # mid-run, after a healthy eval phase); every attempt's median is
    # reported so nothing is hidden, and degraded_tunnel is true if any
    # phase's LAST attempt still sat below its floor.
    max_attempts = 1 if smoke else 3
    phase_attempts = {}
    import gc
    import sys as _sys

    def with_retry(name, floor, run):
        """run() -> (per-repeat values, extras...); retried while the
        median sits below ``floor`` (an environmental outage, not noise:
        floors are set several-fold under each phase's honest band)."""
        log = phase_attempts.setdefault(name, [])
        for attempt in range(max_attempts):
            result = run()
            med = float(np.median(result[0]))
            log.append(round(med, 3))
            if med >= floor or attempt == max_attempts - 1:
                return result
            print(f"bench {name} attempt {attempt}: median {log[-1]} < "
                  f"{floor} — degraded tunnel window, retrying in 120 s",
                  file=_sys.stderr, flush=True)
            time.sleep(120)

    # floors: several-fold under each phase's honest observed band
    # (eval 155-197 scenes/s, train 114-117 scenes/s, e2e 76-143 rows/s)
    eval_floor = 0.0 if smoke else 50.0
    train_floor = 0.0 if smoke else 30.0
    e2e_floor = 0.0 if smoke else 20.0

    eval_sps, eval_flops_per_sec = with_retry(
        "eval", eval_floor,
        lambda: bench_eval(cfg, dc, params, state,
                           n_iters=n_iters, repeats=repeats))
    train_sps, train_flops_per_sec, train_loss = with_retry(
        "train", train_floor,
        lambda: bench_train(cfg, dc, params, state,
                            n_iters=n_iters, repeats=repeats))
    # secondary row: batch 16 (BASELINE.md notes batch 8 is the comparison
    # shape, not a TPU constraint — report what the bigger batch buys)
    train16_sps, _, _ = bench_train(cfg, dc, params, state, batch_size=16,
                                    n_iters=n_iters, repeats=repeats)
    # drop the train bench's leftovers (20 in-flight TrainState copies
    # hold ~2.4 GB of HBM in reference cycles) before the e2e phase: with
    # them alive the 1-core host's e2e stream measured ~2x slower
    gc.collect()
    e2e_rps, e2e_timing = with_retry(
        "e2e", e2e_floor,
        lambda: bench_mul_eval_e2e(cfg, dc,
                                   num_scenes=6 if smoke else 141,
                                   repeats=repeats))
    degraded = (phase_attempts["eval"][-1] < eval_floor
                or phase_attempts["train"][-1] < train_floor
                or phase_attempts["e2e"][-1] < e2e_floor)

    eval_med = float(np.median(eval_sps))
    train_med = float(np.median(train_sps))
    e2e_med = float(np.median(e2e_rps))
    print(json.dumps({
        "metric": "eval_scenes_per_sec_full_forward_plus_256way_greedy_decode",
        "value": round(eval_med, 3),
        "unit": "scenes/sec",
        "vs_baseline": round(eval_med / BASELINE_EVAL_SCENES_PER_SEC, 2),
        "eval_scenes_per_sec_stats": _stats(eval_sps),
        "eval_tflops_per_sec": round(eval_flops_per_sec / 1e12, 2),
        "eval_mfu_pct": round(100 * eval_flops_per_sec / peak, 2),
        "train_scenes_per_sec": round(train_med, 3),
        "train_vs_baseline": round(train_med / BASELINE_TRAIN_SCENES_PER_SEC, 2),
        "train_scenes_per_sec_stats": _stats(train_sps),
        "train_scenes_per_sec_b16": round(float(np.median(train16_sps)), 3),
        "train_scenes_per_sec_b16_stats": _stats(train16_sps),
        "train_tflops_per_sec": round(train_flops_per_sec / 1e12, 2),
        "train_mfu_pct": round(100 * train_flops_per_sec / peak, 2),
        "train_loss_finite": bool(np.isfinite(train_loss)),
        "mul_eval_e2e_rows_per_sec": round(e2e_med, 3),
        "mul_eval_e2e_vs_baseline": round(
            e2e_med / BASELINE_EVAL_SCENES_PER_SEC, 2),
        "mul_eval_e2e_rows_per_sec_stats": _stats(e2e_rps),
        "mul_eval_e2e_phases": {k: round(v, 2) if isinstance(v, float) else v
                                for k, v in e2e_timing.items()},
        "repeats": repeats,
        "phase_attempts": phase_attempts,
        "degraded_tunnel": degraded,
        "loadavg_start": loadavg_start,
        "decode_dtype": cfg.eval_decode_dtype,
        "device_kind": getattr(dev, "device_kind", str(dev)),
        "peak_tflops_assumed": peak / 1e12,
    }))


if __name__ == "__main__":
    main()
