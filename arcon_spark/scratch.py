"""Per-process scratch directories with end-of-process cleanup.

Roundtrip/streaming queries stage temp data (tapes, checkpoints, log
topics, container files) per invocation; bare ``tempfile.mkdtemp``
left those orphaned in /tmp, so repeated gate/bench runs accumulated
garbage. All query-path temp dirs now come from :func:`scratch_dir`,
which nests them under one per-process root removed at interpreter
exit. Dirs stay alive for the whole session (lazy DataFrames returned
to the caller may read them long after the query function returns),
which is exactly the lifetime the queries need.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """A fresh temp dir under the session scratch root (removed at
    process exit)."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="arcon_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)
