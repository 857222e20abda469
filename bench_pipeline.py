"""Whole-DAG wall-clock benchmark: scenes/hour through `run_all`.

Per-stage device throughputs are measured to the roofline by bench.py;
this harness answers the PRODUCTION question the reference exists for
(batch data manufacture, `E_make_train_data.py:187-272`): how many
scenes/hour does the END-TO-END pipeline (cut -> denoise -> noise_pool
-> [train_kernel] -> factory -> check_shapes [-> sr_train]) push through
THIS host+device, including NetCDF zlib IO and host<->device transfer
(VERDICT r3 item 3).

It drives the committed quality config (configs/quality_x8.json — the
same config behind docs/QUALITY.md) on freshly generated synthetic
scenes in a clean workdir, then reports:

  - per-stage wall seconds (from run_pipeline's timing dict),
  - scenes/hour over the DATA-MANUFACTURE stages (cut..check_shapes;
    training stages are amortizable one-time costs and reported
    separately),
  - the dominant stage,
  - a host-vs-device split for the instrumented hot stages (denoise,
    factory) from `utils.profiling.stage_timer` scopes:
      *.device_sync   main-thread time blocked on the device result
                      (the one-deep pipelined writeback's fence)
      *.host_write    main-thread zlib .nc writes
      *.host_read(_bg) file reads (the _bg scope runs on the reader
                      thread and OVERLAPS device compute — not additive)

Prints ONE JSON line. Not wired into bench.py (it re-runs training; the
driver's budget is for the kernel manifest) — run manually per round:

    python bench_pipeline.py [--scenes 8] [--size 896] [--sr-iters N]
        [--skip-sr] [--workdir DIR]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--config", default="configs/quality_x8.json")
    p.add_argument("--scenes", type=int, default=8)
    p.add_argument("--size", type=int, default=896)
    p.add_argument("--workdir", default="bench_pipeline_run")
    p.add_argument("--sr-iters", type=int, default=None,
                   help="override sr_train iters (the committed config's "
                        "20000 measures the full quality run)")
    p.add_argument("--skip-sr", action="store_true",
                   help="data-manufacture DAG only (cut..check_shapes)")
    p.add_argument("--keep", action="store_true",
                   help="keep the workdir (default: deleted on success)")
    p.add_argument("--resume", action="store_true",
                   help="reuse an existing workdir: completed stages skip "
                        "via their run_all markers and report their "
                        "RECORDED seconds (tunnel-wedge recovery; a resumed "
                        "total is stitched across sessions — noted in the "
                        "output)")
    a = p.parse_args(argv)

    from kmsr_tpu.utils.cache import enable_persistent_cache
    from kmsr_tpu.utils.profiling import detect_sync_stall, timing_report

    enable_persistent_cache()

    if os.path.exists(a.workdir) and not a.resume:
        shutil.rmtree(a.workdir)
    scenes_dir = os.path.join(a.workdir, "scenes")
    work = os.path.join(a.workdir, "work")

    # 1. synthesize the committed quality inputs (not counted: the
    #    production input is pre-existing calibrated scenes)
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    import make_quality_scenes

    t0 = time.time()
    if not (a.resume and os.path.isdir(scenes_dir)):
        make_quality_scenes.main([scenes_dir, "--n", str(a.scenes),
                                  "--size", str(a.size)])
    t_gen = time.time() - t0

    # 2. the committed config, retargeted at the fresh workdir
    with open(a.config, encoding="utf-8") as f:
        config = json.load(f)
    config["workdir"] = work
    config["input_dir"] = scenes_dir
    stages = config.setdefault("stages", {})
    if a.skip_sr:
        stages.setdefault("sr_train", {})["enabled"] = False
    elif a.sr_iters is not None:
        stages.setdefault("sr_train", {})["iters"] = a.sr_iters

    from kmsr_tpu.pipeline.run_all import run_pipeline

    timings = run_pipeline(config, resume=a.resume)
    scopes = timing_report()
    stitched = []
    if a.resume:
        # stages skipped via markers report their RECORDED wall seconds
        for mf in glob.glob(os.path.join(work, ".stages", "*.json")):
            with open(mf, encoding="utf-8") as f:
                m = json.load(f)
            if m["stage"] not in timings:
                timings[m["stage"]] = m["seconds"]
                stitched.append(m["stage"])

    data_stages = [s for s in ("calibrate", "cut", "denoise", "noise_pool",
                               "factory", "apply_kernel", "make_train_data",
                               "check_shapes") if s in timings]
    train_stages = [s for s in ("train_kernel", "sr_train") if s in timings]
    data_s = sum(timings[s] for s in data_stages)
    scenes_per_hour = a.scenes * 3600.0 / data_s if data_s else float("nan")
    dominant = max(data_stages, key=lambda s: timings[s]) if data_stages else None

    split = {}
    for name, rec in sorted(scopes.items()):
        if any(name.startswith(k) for k in ("denoise.", "factory.")):
            split[name] = round(rec["total_s"], 2)

    # wedged-session self-disqualification (VERDICT r4 item 1): a stage
    # blocked on device_sync far beyond its host work means the tunnel /
    # device stalled mid-run — the throughput number is then an incident
    # artifact, not a measurement, and must never become the headline
    stall_flags = detect_sync_stall(scopes, timings)
    if stall_flags:
        print(f"[bench_pipeline] TAINTED: device-sync stall detected in "
              f"{[f['stage'] for f in stall_flags]} — this JSON is an "
              f"incident record, not a clean measurement", file=sys.stderr)

    n_pairs = len(glob.glob(os.path.join(work, "train_pairs", "*.nc")))
    result = {
        "metric": "pipeline_scenes_per_hour",
        "value": round(scenes_per_hour, 2),
        "unit": "scenes/h",
        "vs_baseline": None,  # the reference publishes no pipeline numbers
        "scenes": a.scenes,
        "scene_px": a.size,
        "train_pairs_produced": n_pairs,
        "data_stages_s": round(data_s, 1),
        "stage_seconds": {k: round(v, 1) for k, v in timings.items()},
        "dominant_stage": dominant,
        "host_device_split_s": split,
        "scene_gen_s": round(t_gen, 1),
        "train_stage_seconds": {
            s: round(timings[s], 1) for s in train_stages
        },
        "stitched_stages": stitched,  # non-empty = cross-session resume
        "tainted": bool(stall_flags),  # true = wedged session, not a number
        "stall_flags": stall_flags,
        "backend": _backend(),
    }
    print(json.dumps(result))
    if not a.keep:
        shutil.rmtree(a.workdir, ignore_errors=True)
    return 0


def _backend() -> str:
    import jax

    return jax.default_backend()


if __name__ == "__main__":
    sys.exit(main())
