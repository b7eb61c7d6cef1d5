"""Profiling hooks: the TPU-native successor of the reference's ad-hoc
chrono/perf workflow (src/main.cc:36-39 wall-clocks; .gitignore:57-62 shows
perf/callgrind artifacts were made locally and never checked in).

Two levels:

* wall-clock + measured throughput counters are built into the runners
  (``return_info=True`` everywhere: executed half-sweeps, matmul FLOPs,
  walk visit counts) — see bench.py;
* ``trace()`` wraps any region in a ``jax.profiler`` trace, producing an
  xplane/perfetto artifact viewable in TensorBoard or ui.perfetto.dev.
  Enabled by the CLI's ``--profile DIR`` flag or ``PPR_PROFILE_DIR``.
"""

from __future__ import annotations

import contextlib
import os

__all__ = ["trace"]


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """Context manager: profile the region into ``log_dir`` (no-op when no
    directory is given and ``PPR_PROFILE_DIR`` is unset)."""
    if log_dir is None:
        log_dir = os.environ.get("PPR_PROFILE_DIR")
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
