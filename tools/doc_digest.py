"""Source digest for generated-doc staleness pinning.

VERDICT r8 #3: SCALE.md / PLANS.md went a round stale because the
doc-pin contract only checked COUNTS — three r8 kernel rewrites
changed physical plans without changing the registry size, and the
stale docs shipped. The fix: every doc-regen tool stamps the digest
of the package source it was generated FROM, and the contract test
(tests/test_registry.py) recomputes the digest at HEAD and fails when
they differ — any package edit (a plan change is always a source
change) forces a regeneration.

Digest = sha256 over the sorted relative paths + contents of every
``arcon_spark/**/*.py`` file. Deliberately content-based, not mtime-
based: git checkouts rewrite mtimes wholesale, so mtime comparisons
would both false-positive (fresh clone) and false-negative (doc file
touched after a source edit).
"""

from __future__ import annotations

import hashlib
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DIGEST_PREFIX = "Source digest: "


def source_digest(repo: str = REPO) -> str:
    """12-hex digest of the arcon_spark package source at HEAD."""
    h = hashlib.sha256()
    pkg = os.path.join(repo, "arcon_spark")
    for root, dirs, files in sorted(os.walk(pkg)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(root, f), repo)
            h.update(rel.encode())
            h.update(b"\0")
            with open(os.path.join(root, f), "rb") as fh:
                h.update(fh.read())
            h.update(b"\0")
    return h.hexdigest()[:12]


def digest_line(repo: str = REPO) -> str:
    """The footer line every generated doc must end with."""
    return f"{DIGEST_PREFIX}{source_digest(repo)}"
