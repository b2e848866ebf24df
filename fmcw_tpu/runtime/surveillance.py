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

from ..params import RadarParams
from ..models import tracker as jt
from ..utils import io as rio


@dataclasses.dataclass
class ScanResult:
    scan: int
    n_dets: int
    active_tracks: int
    report: dict
    tracker_state: dict  # carried pytree — checkpoint via utils.checkpoint


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
    tp = params.tracker
    state = tracker_state if tracker_state is not None else jt.init_state(tp)
    if det_log:
        open(det_log, "w").close()
    if trk_log:
        open(trk_log, "w").close()

    scan = start_scan
    buf: list[np.ndarray] = []

    def flush(buf):
        nonlocal scan, state
        batch = np.stack(buf)
        out = proc(batch, mti_bypass=mti_bypass, scale_override=scale_override)
        out = jax.tree.map(np.asarray, out)
        for i in range(len(buf)):
            scan += 1
            v = out["valid"][i]
            if det_log:
                rio.write_detections(det_log, out["range_bin"][i][v],
                                     out["doppler_bin"][i][v],
                                     out["mag"][i][v], append=True)
            state, rep = jt.step(state, out["range_bin"][i],
                                 out["doppler_bin"][i],
                                 out["mag"][i].astype(np.int32),
                                 out["valid"][i], tp=tp)
            rep = jax.tree.map(np.asarray, rep)
            ids = np.nonzero(rep["report_mask"])[0]
            if trk_log:
                rio.write_tracks(trk_log, [
                    {"id": t, "range_pos": rep["range_pos"][t],
                     "dopp_pos": rep["dopp_pos"][t],
                     "range_vel": rep["range_vel"][t],
                     "quality": rep["quality"][t],
                     "status": rep["status"][t]} for t in ids],
                    active_count=int(rep["active_tracks"]), append=True)
            yield ScanResult(scan=scan, n_dets=int(np.sum(v)),
                             active_tracks=int(rep["active_tracks"]),
                             report=rep, tracker_state=state)

    for f in frames:
        buf.append(f)
        if len(buf) == batch_scans:
            yield from flush(buf)
            buf = []
    if buf:
        yield from flush(buf)
