"""Checkpoint/resume for long-lived processing state.

The reference's only long-lived state is the tracker's track file, lost on
reset (SURVEY.md §5 "checkpoint/resume: none").  The framework does better:
the tracker state is a pytree of arrays, checkpointed with scan metadata so a
multi-hour surveillance run (120+ scans) can resume exactly where it stopped.
"""

from __future__ import annotations

import json

import numpy as np


def save(path: str, tracker_state: dict, scan_index: int = 0,
         metadata: dict | None = None) -> None:
    """Save tracker state (+ scan counter and arbitrary JSON metadata) to an
    .npz file."""
    arrays = {k: np.asarray(v) for k, v in tracker_state.items()}
    arrays["__scan_index__"] = np.asarray(scan_index)
    arrays["__metadata__"] = np.frombuffer(
        json.dumps(metadata or {}).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load(path: str):
    """Load a checkpoint -> (tracker_state, scan_index, metadata)."""
    with np.load(path) as z:
        scan_index = int(z["__scan_index__"])
        metadata = json.loads(bytes(z["__metadata__"]).decode())
        state = {k: z[k] for k in z.files
                 if not k.startswith("__")}
    return state, scan_index, metadata
