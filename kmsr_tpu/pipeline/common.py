"""Shared pipeline-runner plumbing: per-file failure isolation + accounting.

Every reference batch driver wraps its per-file work in try/except-continue
with success/failure counting (`A_00_patch_cutter_universal.py:409-419`,
`E_make_train_data.py:264-272`, `denoise/batch_denoise.py:60-93`) so one
bad file never kills a run; this module centralizes that contract.
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
import traceback
from typing import Callable, Iterable, Optional


@dataclasses.dataclass
class RunReport:
    succeeded: list
    failed: list            # (item, error string)
    seconds: float

    @property
    def n_ok(self) -> int:
        return len(self.succeeded)

    @property
    def n_fail(self) -> int:
        return len(self.failed)

    def summary(self) -> str:
        return (
            f"{self.n_ok} succeeded, {self.n_fail} failed "
            f"in {self.seconds:.1f}s"
        )


def run_per_file(
    items: Iterable,
    fn: Callable,
    desc: str = "processing",
    progress: bool = True,
    verbose_errors: bool = False,
    on_error: Optional[Callable] = None,
) -> RunReport:
    """Apply `fn(item)` to every item; isolate failures; account results."""
    items = list(items)
    if progress:
        try:
            from tqdm import tqdm

            items_iter = tqdm(items, desc=desc, unit="file")
        except ImportError:
            items_iter = items
    else:
        items_iter = items
    t0 = time.time()
    ok, fail = [], []
    for item in items_iter:
        try:
            fn(item)
            ok.append(item)
        except Exception as e:
            fail.append((item, str(e)))
            if verbose_errors:
                traceback.print_exc()
            if on_error:
                on_error(item, e)
    return RunReport(succeeded=ok, failed=fail, seconds=time.time() - t0)


class DeviceSyncGuard:
    """Escalate persistent device-sync failures into a run abort.

    The pipelined writebacks (factory, apply_kernel, sr_infer) sync each
    batch with np.asarray AFTER the next batch was dispatched, so
    device-side runtime failures surface there; a single bad batch is
    isolated per-file (reference failure-isolation contract). But a
    permanently wedged device — or a programming error — would convert
    EVERY remaining batch into per-file failures while the driver keeps
    dispatching to a dead device. This guard re-raises after
    `max_consecutive` whole-batch sync failures in a row so such runs
    abort loudly instead of grinding to a 100%-failed report.
    """

    def __init__(self, max_consecutive: int = 3):
        self.max_consecutive = max_consecutive
        self._consecutive = 0

    def succeeded(self) -> None:
        self._consecutive = 0

    def failed(self, exc: Exception) -> None:
        """Record one whole-batch sync failure; re-raise when persistent."""
        self._consecutive += 1
        if self._consecutive >= self.max_consecutive:
            raise RuntimeError(
                f"{self._consecutive} consecutive whole-batch device syncs "
                f"failed (last: {type(exc).__name__}: {exc}) — device wedged "
                f"or programming error; aborting instead of failing every "
                f"remaining batch"
            ) from exc


def _proc_cpu_seconds() -> float:
    """This process's cumulative user+system CPU seconds (/proc/self/stat)."""
    import os

    with open("/proc/self/stat", "rb") as f:
        fields = f.read().rsplit(b")", 1)[1].split()
    # fields[11]=utime, fields[12]=stime after the comm close-paren
    return (int(fields[11]) + int(fields[12])) / os.sysconf("SC_CLK_TCK")


def diagnose_sync_state(cpu_sample_s: float = 0.5) -> tuple[str, dict]:
    """Separate a wedged device sync from a server-side compile.

    Automates the manual procedure from the r4 tunnel incidents
    (`docs/NOTES_r4.md` "Incidents (continued)"): during a long sync,
    a thread blocked in `ep_poll` means the axon tunnel is alive and
    waiting on the server (remote compile in progress — wait), while a
    frozen host with NO epoll thread means the stream is wedged
    (kill + restart). Returns (state, detail) with state one of
    "remote_compile", "suspected_wedge", "host_busy".
    """
    import glob

    wchans = []
    for p in glob.glob("/proc/self/task/*/wchan"):
        try:
            with open(p) as f:
                wchans.append(f.read().strip())
        except OSError:
            continue
    n_epoll = sum("ep_poll" in w for w in wchans)
    if n_epoll:
        return "remote_compile", {"epoll_threads": n_epoll}
    cpu0 = _proc_cpu_seconds()
    time.sleep(cpu_sample_s)
    busy = (_proc_cpu_seconds() - cpu0) / cpu_sample_s
    if busy < 0.05:
        return "suspected_wedge", {"host_cpu_util": round(busy, 3),
                                   "epoll_threads": 0}
    return "host_busy", {"host_cpu_util": round(busy, 3)}


class SyncWatchdog:
    """Diagnose syncs that HANG (DeviceSyncGuard only sees ones that FAIL).

    One monitor thread per stage run; `watch()` wraps each blocking
    device sync. Once a sync exceeds `threshold_s` the monitor runs
    `diagnose_sync_state` every `poll_s`, logging "remote compile in
    progress" (wait — r4 measured a legitimate 15-min server-side
    compile) vs "suspected wedge". If the wedge diagnosis persists past
    `wedge_abort_s`, `on_abort(record)` fires; the default logs the
    diagnosis and hard-exits (os._exit(86)) because a truly wedged
    remote sync never returns — no exception can be raised into the
    blocked C call — and grinding forever is the failure mode this
    exists to prevent (VERDICT r4 item 4).
    """

    def __init__(
        self,
        label: str = "sync",
        threshold_s: float = 120.0,
        poll_s: float = 30.0,
        wedge_abort_s: Optional[float] = None,
        diagnose: Callable = diagnose_sync_state,
        on_abort: Optional[Callable] = None,
        log: Callable = print,
    ):
        import threading

        self.label = label
        self.threshold_s = threshold_s
        self.poll_s = poll_s
        self.wedge_abort_s = wedge_abort_s
        self._diagnose = diagnose
        self._on_abort = on_abort or self._default_abort
        self._log = log
        self._lock = threading.Lock()
        self._sync_since: Optional[float] = None
        self._wedge_since: Optional[float] = None
        self.diagnoses: list = []  # (elapsed_s, state) history, for reports
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._monitor, daemon=True)
        self._thread.start()

    def _default_abort(self, record: dict) -> None:
        import os
        import sys

        print(f"[{self.label}] ABORT: device sync hung "
              f"{record['elapsed_s']:.0f}s with persistent wedge diagnosis "
              f"{record['detail']} — exiting (axon stream wedged; no "
              f"exception can unwind a blocked remote sync)",
              file=sys.stderr, flush=True)
        os._exit(86)

    @contextlib.contextmanager
    def watch(self):
        with self._lock:
            self._sync_since = time.monotonic()
            self._wedge_since = None
        try:
            yield
        finally:
            with self._lock:
                self._sync_since = None
                self._wedge_since = None

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    def _monitor(self) -> None:
        while not self._stop.wait(self.poll_s):
            with self._lock:
                since = self._sync_since
            if since is None:
                continue
            elapsed = time.monotonic() - since
            if elapsed < self.threshold_s:
                continue
            state, detail = self._diagnose()
            self.diagnoses.append((round(elapsed, 1), state))
            if state == "remote_compile":
                self._log(f"[{self.label}] sync blocked {elapsed:.0f}s: "
                          f"epoll thread waiting -> remote compile in "
                          f"progress, waiting ({detail})")
                with self._lock:
                    self._wedge_since = None
            elif state == "suspected_wedge":
                with self._lock:
                    if self._wedge_since is None:
                        self._wedge_since = time.monotonic()
                    wedge_for = time.monotonic() - self._wedge_since
                self._log(f"[{self.label}] sync blocked {elapsed:.0f}s: host "
                          f"frozen, no epoll thread -> SUSPECTED WEDGE "
                          f"({wedge_for:.0f}s persistent; {detail})")
                if (self.wedge_abort_s is not None
                        and wedge_for >= self.wedge_abort_s):
                    self._on_abort({
                        "label": self.label,
                        "elapsed_s": elapsed,
                        "wedge_persist_s": wedge_for,
                        "detail": detail,
                        "history": list(self.diagnoses),
                    })
            else:  # host_busy: sync is long but the host is working
                with self._lock:
                    self._wedge_since = None


_WATCHDOGS: dict = {}


def sync_watch(label: str):
    """Wrap a blocking device sync in the process-wide watchdog for
    `label` (one daemon monitor thread per label, created on first use).

    Tunables via env: KMSR_SYNC_WATCHDOG_THRESHOLD_S (default 120 —
    below it a sync is presumed a normal dispatch/compile),
    KMSR_SYNC_WEDGE_ABORT_S (default 900 — persistent-wedge abort;
    0 disables the abort, keeping diagnosis-only logging),
    KMSR_SYNC_WATCHDOG=0 disables entirely (no-op context).
    """
    import os

    if os.environ.get("KMSR_SYNC_WATCHDOG", "1") == "0":
        return contextlib.nullcontext()
    wd = _WATCHDOGS.get(label)
    if wd is None:
        abort_s = float(os.environ.get("KMSR_SYNC_WEDGE_ABORT_S", "900"))
        wd = SyncWatchdog(
            label=label,
            threshold_s=float(
                os.environ.get("KMSR_SYNC_WATCHDOG_THRESHOLD_S", "120")),
            wedge_abort_s=abort_s if abort_s > 0 else None,
        )
        _WATCHDOGS[label] = wd
    return wd.watch()


def chunked_reader(
    files: list,
    batch_size: int,
    read_fn: Callable,
    lookahead: int = 2,
    timer: Optional[str] = None,
):
    """Yield (valid_paths, stacks, failures) per chunk, with the NEXT
    chunk's file reads running on a background thread while the caller
    (typically a device computation) consumes the current one — the host
    IO / device-compute overlap the file-batched stages (factory,
    apply_kernel, sr_infer) use. Per-file failure isolation preserved;
    chunks are yielded strictly in order so seeded RNG streams match the
    synchronous path.

    timer: optional `utils.profiling.stage_timer` scope name accumulated
    around each file read (BACKGROUND-thread busy time — it overlaps the
    caller's device compute, so it is not additive with main-thread
    scopes; `bench_pipeline.py` reports it as such).
    """
    import queue
    import threading

    if timer is not None:
        from ..utils.profiling import stage_timer
    else:
        stage_timer = None

    q: "queue.Queue" = queue.Queue(maxsize=lookahead)

    def worker():
        for start in range(0, len(files), batch_size):
            chunk = files[start : start + batch_size]
            stacks, valid, fail = [], [], []
            for path in chunk:
                try:
                    if stage_timer is not None:
                        with stage_timer(timer):
                            stacks.append(read_fn(path))
                    else:
                        stacks.append(read_fn(path))
                    valid.append(path)
                except Exception as e:
                    fail.append((path, str(e)))
            q.put((valid, stacks, fail))
        q.put(None)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is None:
            return
        yield item


@contextlib.contextmanager
def maybe_trace(log_dir: Optional[str]):
    """Wrap a stage body in a jax.profiler device trace when log_dir is
    set (CLI `--trace DIR`); no-op otherwise. View with TensorBoard."""
    if not log_dir:
        yield
        return
    from ..utils.profiling import device_trace

    with device_trace(log_dir):
        yield
    print(f"[trace] device timeline written to {log_dir}")


# Re-exported for the pipeline stages; the implementation lives in
# parallel.local_dp (ops modules use it too and must not import pipeline).
from ..parallel.local_dp import local_batch_dp, pad_put  # noqa: E402,F401


def route_per_scene_kernels(
    files: list, kernel_root: str, run_scene: Callable, label: str,
    output_dir: str,
) -> RunReport:
    """Shared per-scene kernel routing (fleet-trainer outdir layout).

    Groups `files` by originating scene (`data.patches.scene_prefix`),
    probes `<kernel_root>/<scene>/kernel_per_band.npy`, and calls
    `run_scene(scene, kernel_path, scene_files) -> RunReport` per scene
    with a kernel; a scene whose kernel artifact is missing fails as a unit
    (per-file accounting, reference failure-isolation contract), the
    rest proceed. Used by both the fused factory and apply_kernel.
    """
    import os

    from ..data.patches import group_by_scene

    t0 = time.time()
    ok_all: list = []
    fail_all: list = []
    for scene, scene_files in group_by_scene(files).items():
        k_path = os.path.join(kernel_root, scene, "kernel_per_band.npy")
        if not os.path.exists(k_path):
            fail_all.extend(
                (f, f"no kernel for scene {scene!r}: {k_path} missing")
                for f in scene_files
            )
            continue
        rep = run_scene(scene, k_path, scene_files)
        ok_all.extend(rep.succeeded)
        fail_all.extend(rep.failed)
    report = RunReport(
        succeeded=ok_all, failed=fail_all, seconds=time.time() - t0
    )
    print(f"{label}[per-scene kernels]: {report.summary()} -> {output_dir}")
    return report
