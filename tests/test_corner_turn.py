"""Corner-turn order tests, mirroring rtl/src/tb_corner_turner.vhd:36-49:
encode val = chirp*256 + sample, verify the exact transposed order — on the
single-chip layout fold and through the multi-chip all_to_all."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from fmcw_tpu.parallel import mesh as M


def test_single_chip_transpose_order():
    n_chirps, n_samples = 16, 8
    val = (np.arange(n_chirps)[:, None] * 256
           + np.arange(n_samples)[None, :])
    out = val.T  # the corner turn (corner_turner.vhd:79-80)
    # Output streams range-major: row r holds (chirp c)*256 + r for c in order.
    for r in range(n_samples):
        assert out[r].tolist() == [c * 256 + r for c in range(n_chirps)]


def test_all_to_all_corner_turn_order():
    mesh = M.make_mesh(dp=1, sp=8)
    n_chirps, n_samples = 16, 64
    val = (np.arange(n_chirps)[:, None] * 256
           + np.arange(n_samples)[None, :]).astype(np.int32)

    def fn(x):  # x local: (n_chirps/8, n_samples)
        y = jax.lax.all_to_all(x, "sp", split_axis=1, concat_axis=0,
                               tiled=True).T
        return y  # local: (n_samples/8, n_chirps)

    out = jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=P("sp", None),
                                out_specs=P("sp", None)))(val)
    assert np.array_equal(np.asarray(out), val.T)


def test_256_chirp_cpi():
    """BASELINE config 2 shape: 256 chirps x 1024 samples flows through the
    pipeline with no code changes (shape generics, radar_core.vhd:12-13)."""
    import fmcw_tpu
    from fmcw_tpu.golden import reference as ref
    from fmcw_tpu.models import pipeline as pl

    p = fmcw_tpu.full().replace(n_doppler=256)
    frame = ref.two_target_frame(p)
    proc = pl.make_processor(p, mode="float32", include_maps=False,
                             peak_group_radius=2)
    out = proc(pl.complex_to_iq(frame))
    v = np.asarray(out["valid"])
    rows = np.asarray(out["range_bin"])[v][:2]
    dops = np.asarray(out["doppler_bin"])[v][:2]
    assert sorted(rows.tolist()) == [100, 500]
    assert sorted(dops.tolist()) == [10, 236]  # Doppler 5/-10 scaled x2
