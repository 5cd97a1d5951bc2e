"""Tracing / profiling (SURVEY §5).

The reference has only ad-hoc wall-clock logging (__main__.py:182,265-267)
and per-stage VQA latency hooks (eval_vqa.py:32-57).  Here: a structured
phase timer whose report nests per-block/per-phase wall times and writes a
JSON artifact, plus a ``jax.profiler`` trace context for real TPU traces
(XLA op-level timelines viewable in TensorBoard/Perfetto).
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Dict, List, Optional

log = logging.getLogger("lightcompress_tpu")


class PhaseTimer:
    """Hierarchical wall-clock phases: ``with timer.phase("block_3/awq"):``.

    Phases with the same name accumulate (count + total seconds).  Safe to
    leave enabled always — overhead is one time.monotonic() pair per phase.
    """

    def __init__(self):
        self._acc: Dict[str, List[float]] = {}
        self._stack: List[str] = []
        self.t0 = time.monotonic()

    @contextlib.contextmanager
    def phase(self, name: str):
        full = "/".join(self._stack + [name])
        self._stack.append(name)
        start = time.monotonic()
        try:
            yield
        finally:
            dt = time.monotonic() - start
            self._stack.pop()
            cnt_tot = self._acc.setdefault(full, [0, 0.0])
            cnt_tot[0] += 1
            cnt_tot[1] += dt

    def report(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, (cnt, tot) in sorted(self._acc.items()):
            out[name] = {"count": cnt, "total_s": round(tot, 4),
                         "mean_s": round(tot / max(cnt, 1), 4)}
        out["__wall__"] = {"count": 1,
                           "total_s": round(time.monotonic() - self.t0, 4),
                           "mean_s": 0.0}
        return out

    def dump(self, path: str) -> str:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)
        return path

    def log_report(self, top: int = 20):
        rep = self.report()
        for name, r in list(rep.items())[:top]:
            log.info("PROFILE %-40s n=%-5d total=%8.3fs mean=%7.4fs",
                     name, r["count"], r["total_s"], r["mean_s"])


# module-level default timer (the pipeline's); import and use anywhere.
timer = PhaseTimer()


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str]):
    """jax.profiler trace context: captures XLA op timelines on the real
    device.  No-op when trace_dir is falsy (so callers can thread a config
    value straight through)."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("device trace written to %s", trace_dir)
