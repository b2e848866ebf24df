"""Surveillance runtime: scan-rate frame batching + tracker loop.

BASELINE config 5 ("many-frame batch (tracking-rate) throughput"): frames
arrive at kHz rates while the tracker runs at scan rate (~Hz).  This runtime
ties the pieces together for a long-running air picture:

* frames are processed in device batches (single-chip batch processor or the
  sharded multi-chip processor) — one dispatch covers many scans' CPIs;
* the tracker consumes one frame's detections per scan, advancing its carried
  pytree state (host-side step per scan; the tracker costs microseconds next
  to the frame pipeline);
* detection/track logs stream out in the reference text formats, so
  model/visualize_radar_targets.py-style analysis works on the output.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Iterator

import numpy as np
import jax
import jax.numpy as jnp

from ..params import RadarParams
from ..models import tracker as jt
from ..utils import io as rio


def _to_host(a) -> np.ndarray:
    """Device array -> host numpy.  On a multi-host mesh the detection
    outputs are batch-sharded across processes (not fully addressable);
    gather them so every host drives the same tracker state and writes
    identical logs — detections are ~KB/scan, so the DCN gather is free
    next to the frame pipeline."""
    if isinstance(a, jax.Array) and not a.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(a, tiled=True))
    return np.asarray(a)


@dataclasses.dataclass
class ScanResult:
    scan: int
    n_dets: int
    active_tracks: int
    report: dict
    tracker_state: dict | None  # populated on each batch's final scan (the
    # checkpoint boundary — utils.checkpoint); None on intermediate scans


def run_surveillance(proc: Callable, frames: Iterable[np.ndarray],
                     params: RadarParams, batch_scans: int = 8,
                     det_log: str | None = None, trk_log: str | None = None,
                     mti_bypass: bool = False, scale_override: int = 0,
                     tracker_state: dict | None = None,
                     start_scan: int = 0) -> Iterator[ScanResult]:
    """Drive ``proc`` (a make_batch_processor / make_sharded_processor
    callable) over ``frames``, batching ``batch_scans`` CPIs per dispatch and
    stepping the TWS tracker once per scan.  Yields a ScanResult per scan.

    ``tracker_state``/``start_scan`` allow resuming from a checkpoint
    (utils/checkpoint.py).
    """
    if batch_scans < 1:
        raise ValueError(f"batch_scans must be >= 1, got {batch_scans}")
    tp = params.tracker
    state = tracker_state if tracker_state is not None else jt.init_state(tp)
    resuming = tracker_state is not None or start_scan > 0
    # A fresh run starts new logs; a resumed run appends to the existing ones.
    if not resuming:
        if det_log:
            open(det_log, "w").close()
        if trk_log:
            open(trk_log, "w").close()

    scan = start_scan
    buf: list[np.ndarray] = []

    def flush(buf):
        nonlocal scan, state
        n_valid = len(buf)
        # Zero-pad the final partial batch: keeps the dispatch shape constant
        # (one compiled executable; sharded processors need batch % dp == 0)
        # at the cost of processing a few dummy frames once per run.
        if n_valid < batch_scans:
            buf = buf + [np.zeros_like(buf[0])] * (batch_scans - n_valid)
        batch = np.stack(buf)
        out = proc(batch, mti_bypass=mti_bypass, scale_override=scale_override)
        out = jax.tree.map(_to_host, out)
        # All of the batch's scans advance the tracker in one on-device
        # lax.scan dispatch (models/tracker.run_scans), then reports stream
        # out per scan.  (A final partial batch runs a shorter scan loop —
        # one extra tracker compile per run; the expensive frame-processor
        # executable keeps its shape.)
        state_dev = {k: jnp.asarray(v) for k, v in state.items()}
        final, reps = jt.run_scans(
            jnp.asarray(out["range_bin"][:n_valid]),
            jnp.asarray(out["doppler_bin"][:n_valid]),
            jnp.asarray(out["mag"][:n_valid].astype(np.int32)),
            jnp.asarray(out["valid"][:n_valid]),
            tp=tp, state=state_dev)
        reps = jax.tree.map(np.asarray, reps)
        state = {k: np.asarray(v) for k, v in final.items()}
        for i in range(n_valid):
            scan += 1
            v = out["valid"][i]
            if det_log:
                rio.write_detections(det_log, out["range_bin"][i][v],
                                     out["doppler_bin"][i][v],
                                     out["mag"][i][v], append=True)
            rep = {k: val[i] for k, val in reps.items()}
            ids = np.nonzero(rep["report_mask"])[0]
            if trk_log:
                rio.write_tracks(trk_log, [
                    {"id": t, "range_pos": rep["range_pos"][t],
                     "dopp_pos": rep["dopp_pos"][t],
                     "range_vel": rep["range_vel"][t],
                     "quality": rep["quality"][t],
                     "status": rep["status"][t]} for t in ids],
                    active_count=int(rep["active_tracks"]), append=True)
            # tracker_state after intermediate scans is not materialized by
            # the fused scan; expose it on the batch's final scan (the
            # checkpointing boundary).
            st = state if i == n_valid - 1 else None
            yield ScanResult(scan=scan, n_dets=int(np.sum(v)),
                             active_tracks=int(rep["active_tracks"]),
                             report=rep, tracker_state=st)

    for f in frames:
        buf.append(f)
        if len(buf) == batch_scans:
            yield from flush(buf)
            buf = []
    if buf:
        yield from flush(buf)
