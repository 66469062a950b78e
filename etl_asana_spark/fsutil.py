"""Local-filesystem probing shared by the volume-derived sizing rules.

Three sizing rules (registry shuffle sizing, streaming state-partition
count, multimodal Python-decode fan-out) each need "how many compressed
bytes live at this path" and previously carried their own copy of the same
os.walk loop (r10 advice). One definition keeps the unprobeable-path
semantics identical everywhere: a path this local walk cannot see (object
store URI, permission error) yields 0 and the caller keeps its explicit
default — auto-sizing degrades to the pre-r10 behavior, never to an error.
"""

from __future__ import annotations

import os


def local_input_bytes(path: str) -> int:
    """Total on-disk bytes of the file or directory at ``path``.

    Unreadable entries are skipped (a partial total still sizes better
    than nothing); a wholly unprobeable path returns 0, the callers'
    "keep the explicit default" sentinel.
    """
    try:
        if not os.path.isdir(path):
            return os.path.getsize(path)
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        return total
    except OSError:
        return 0
