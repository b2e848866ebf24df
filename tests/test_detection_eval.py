"""Detection-quality harness (utils/eval.py): statistical sanity.

The framework analog of the reference's in-testbench detection statistics
(tb_os_cfar_2d.vhd:131-155: detections on targets, bounded false alarms on
noise).  Assertions are loose envelopes — the point is that the Pd curve is
a proper sigmoid and Pfa is bounded, not exact operating-point values.
"""

import numpy as np

from fmcw_tpu import RadarParams, CfarParams
from fmcw_tpu.utils import eval as ev


def test_pd_curve_and_pfa_envelope():
    p = RadarParams(n_range=256, n_doppler=64,
                    cfar=CfarParams(scale_block=2))
    res = ev.pd_pfa(p, snr_dbs=(-35, -24, -18), variants=("os", "ca"),
                    trials=16, noise_trials=8, seed=1)
    for v, r in res.items():
        pd = r["pd"]
        assert pd[-35] <= 0.25, (v, pd)          # below threshold
        assert pd[-18] >= 0.9, (v, pd)           # comfortably above
        assert pd[-35] <= pd[-24] <= pd[-18] + 1e-9, (v, pd)
        assert r["pfa"] <= 1e-3, (v, r["pfa"])   # noise-only false alarms


def test_trial_frame_synthesis():
    p = RadarParams(n_range=256, n_doppler=64)
    rng = np.random.default_rng(0)
    noise = ev.synth_trial_frame(p, rng, None, 0, 0)
    assert noise.shape == (64, 256, 2) and noise.dtype == np.int16
    tgt = ev.synth_trial_frame(p, rng, 0.0, 100.3, 20.7)
    # A 0 dB input-SNR tone dominates the spectrum at the injected bins.
    z = tgt[..., 0].astype(np.float64) + 1j * tgt[..., 1]
    f = np.fft.fft2(z)
    d, r = np.unravel_index(np.argmax(np.abs(f)), f.shape)
    assert abs(r - 100.3) <= 1.0 and abs(d - 20.7) <= 1.0
