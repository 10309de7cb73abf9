"""Structured metrics + logging (SURVEY.md §5.5).

The reference observes itself through ~40 ``print()`` sites. Here the evolve loop
already returns per-iteration metric arrays (:class:`maus_tpu.solver.evolve.
Metrics`, same metric names as the reference — ``landscape_energy``,
``avg_residual``, ``avg_stuckness``, ``num_distinct``); this module is the host
side: a JSONL sink, a stdlib-logging bridge, and a tiny wall-clock scope timer
for profiling sections (§5.1).
"""
from __future__ import annotations

import json
import logging
import time
from contextlib import contextmanager
from typing import IO, Optional

import numpy as np

logger = logging.getLogger("maus_tpu")


def configure_logging(level: int = logging.INFO) -> None:
    """Standard logging setup (replaces the reference's prints)."""
    h = logging.StreamHandler()
    h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s "
                                     "%(message)s"))
    logger.handlers[:] = [h]
    logger.setLevel(level)


class MetricsSink:
    """Append-only JSONL metrics writer."""

    def __init__(self, path_or_file):
        self._own = isinstance(path_or_file, str)
        self._f: IO = open(path_or_file, "a") if self._own else path_or_file

    def write(self, record: dict) -> None:
        self._f.write(json.dumps(record, default=_jsonify) + "\n")
        self._f.flush()

    def write_trace(self, metrics, prefix: Optional[dict] = None) -> int:
        """Write one record per iteration from a stacked Metrics namedtuple."""
        from .xfer import to_host_complex   # complex-safe device readback
        fields = metrics._fields
        arrays = [to_host_complex(getattr(metrics, f)) for f in fields]
        n = len(arrays[0])
        for i in range(n):
            rec = dict(prefix or {})
            rec["iteration"] = i
            rec.update({f: a[i] for f, a in zip(fields, arrays)})
            self.write(rec)
        return n

    def close(self):
        if self._own:
            self._f.close()


def _jsonify(x):
    if isinstance(x, (np.integer,)):
        return int(x)
    if isinstance(x, (np.floating,)):
        return float(x)
    if isinstance(x, (np.complexfloating, complex)):
        return [float(x.real), float(x.imag)]
    if isinstance(x, np.ndarray):
        return x.tolist()
    return str(x)


@contextmanager
def timed(name: str, sink: Optional[MetricsSink] = None):
    """Wall-clock scope timer; logs and optionally records the duration."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    logger.info("%s: %.4fs", name, dt)
    if sink is not None:
        sink.write({"timer": name, "seconds": dt})


@contextmanager
def profile_trace(log_dir: str):
    """Capture a device profile for the enclosed scope (SURVEY.md §5.1 —
    host-side ``jax.profiler`` hook; view with TensorBoard or xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
