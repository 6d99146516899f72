"""Tile-wavefront Pallas block traversal vs the brute-force scan oracle.

Runs the kernel in interpret mode so the test works on the CPU test
backend; on TPU hardware the same kernel is the compiled production path
for any static scene using the block accelerator (accel/blocks.py query
dispatches to it when accel/tiles.use_tiles() passes its probe).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from libyafaray_tpu.accel.blocks import build_blocks
from libyafaray_tpu.accel.tiles import tiles_traverse, tile_candidates
from libyafaray_tpu.ops import intersect as I

from test_pallas_intersect import _random_geom, _rays


@pytest.mark.parametrize("shadow", [False, True])
def test_tiles_matches_scan_oracle(rng, shadow, monkeypatch):
    f, n = 700, 2048
    geom = _random_geom(rng, f)
    acc = build_blocks(geom)
    assert acc.num_blocks > 1 and acc.tab is not None
    o, d = _rays(rng, n)
    t_min = jnp.full(n, 1e-4)
    t_max = jnp.full(n, 1e30)
    excl = jnp.full(n, -1, jnp.int32).at[::5].set(7)

    monkeypatch.setattr(I, "_pallas_ok", lambda g: False)
    ref = I._brute_closest(geom, o, d, t_min, t_max, excl, shadow=shadow)

    t, p, u, v = tiles_traverse(
        acc.tab, acc.bmin, acc.bmax, o, d, t_min, t_max, excl,
        shadow=shadow, interpret=True)

    valid = np.asarray(p) >= 0
    np.testing.assert_array_equal(valid, np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(p)[valid],
                                  np.asarray(ref.prim)[valid])
    np.testing.assert_allclose(np.asarray(t)[valid],
                               np.asarray(ref.t)[valid], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(u)[valid],
                               np.asarray(ref.uv)[valid, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(v)[valid],
                               np.asarray(ref.uv)[valid, 1], atol=1e-4)


def test_tiles_any_hit(rng, monkeypatch):
    f, n = 500, 1024
    geom = _random_geom(rng, f)
    acc = build_blocks(geom)
    o, d = _rays(rng, n)
    t_min = jnp.full(n, 1e-4)
    t_max = jnp.full(n, 1e30)
    excl = jnp.full(n, -1, jnp.int32)

    monkeypatch.setattr(I, "_pallas_ok", lambda g: False)
    ref = I._brute_closest(geom, o, d, t_min, t_max, excl, shadow=True)

    _, p, _, _ = tiles_traverse(
        acc.tab, acc.bmin, acc.bmax, o, d, t_min, t_max, excl,
        shadow=True, any_hit=True,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(p) >= 0, np.asarray(ref.valid))


def test_tiles_tmax_and_padding(rng):
    """Short rays terminate (t_max respected) and a non-multiple-of-1024
    ray count is padded internally without corrupting results."""
    f, n = 400, 777
    geom = _random_geom(rng, f)
    acc = build_blocks(geom)
    o, d = _rays(rng, n)
    t_min = jnp.full(n, 1e-4)
    t_max = jnp.full(n, 0.8)   # many rays now stop short
    excl = jnp.full(n, -1, jnp.int32)

    ref = I._brute_closest(geom, o, d, t_min, t_max, excl)
    t, p, _, _ = tiles_traverse(
        acc.tab, acc.bmin, acc.bmax, o, d, t_min, t_max, excl,
        interpret=True)
    valid = np.asarray(p) >= 0
    np.testing.assert_array_equal(valid, np.asarray(ref.valid))
    np.testing.assert_allclose(np.asarray(t)[valid],
                               np.asarray(ref.t)[valid], rtol=1e-4, atol=1e-6)


def test_tile_candidates_conservative(rng):
    """Every block a per-ray slab test accepts must appear in its tile's
    candidate list (the interval test may over-include, never drop)."""
    f, n = 600, 2048
    geom = _random_geom(rng, f)
    acc = build_blocks(geom)
    o, d = _rays(rng, n)
    t_min = np.full(n, 1e-4, np.float32)
    t_max = np.full(n, 1e30, np.float32)
    cand, ent, count = tile_candidates(
        acc.bmin, acc.bmax, jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(t_min), jnp.asarray(t_max))
    cand, count = np.asarray(cand), np.asarray(count)

    bmin, bmax = np.asarray(acc.bmin), np.asarray(acc.bmax)
    o_np, d_np = np.asarray(o), np.asarray(d)
    inv = 1.0 / np.where(np.abs(d_np) < 1e-12,
                         np.where(d_np < 0, -1e-12, 1e-12), d_np)
    t0 = (bmin[None] - o_np[:, None]) * inv[:, None]
    t1 = (bmax[None] - o_np[:, None]) * inv[:, None]
    tn = np.max(np.minimum(t0, t1), axis=-1)
    tf = np.min(np.maximum(t0, t1), axis=-1)
    per_ray = (tn <= tf) & (tf >= t_min[:, None]) & (tn <= t_max[:, None])

    tiles = per_ray.reshape(-1, 1024, acc.num_blocks).any(axis=1)
    for ti in range(tiles.shape[0]):
        listed = set(cand[ti, :count[ti, 0]].tolist())
        needed = set(np.nonzero(tiles[ti])[0].tolist())
        assert needed <= listed


def test_tiles_motion_blur_matches_scan(rng, monkeypatch):
    """Motion-blurred traversal through the VMEM-resident tiles kernel
    (per-ray linear vertex blend in-kernel) vs the brute scan oracle."""
    f, n = 600, 1024
    geom = _random_geom(rng, f, motion=True)
    acc = build_blocks(geom)
    assert acc.tab_t1 is not None
    o, d = _rays(rng, n)
    t_min = jnp.full(n, 1e-4)
    t_max = jnp.full(n, 1e30)
    excl = jnp.full(n, -1, jnp.int32)
    time = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))

    monkeypatch.setattr(I, "_pallas_ok", lambda g: False)
    ref = I._brute_closest(geom, o, d, t_min, t_max, excl, time=time)

    t, p, u, v = tiles_traverse(
        acc.tab, acc.bmin, acc.bmax, o, d, t_min, t_max, excl,
        tab_t1=acc.tab_t1, tab_t2=acc.tab_t2, time=time, interpret=True)
    valid = np.asarray(p) >= 0
    np.testing.assert_array_equal(valid, np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(p)[valid],
                                  np.asarray(ref.prim)[valid])
    np.testing.assert_allclose(np.asarray(t)[valid],
                               np.asarray(ref.t)[valid], rtol=1e-4,
                               atol=1e-6)


def test_query_sorted_path_matches_oracle(rng, monkeypatch):
    """blocks.query with n > RAY_CHUNK exercises the variadic-sort ray
    reordering (sort-carry + sort-back, no gathers); must match the scan
    oracle in original ray order, including dead rays (empty t-range)."""
    from libyafaray_tpu.accel import blocks as BL
    f, n = 900, 9000
    geom = _random_geom(rng, f)
    acc = build_blocks(geom)
    o, d = _rays(rng, n)
    t_min = jnp.full(n, 1e-4)
    # a scattering of dead rays (terminated paths)
    t_max = jnp.where(jnp.arange(n) % 7 == 3, -1.0, 1e30)
    excl = jnp.full(n, -1, jnp.int32).at[::11].set(3)

    monkeypatch.setattr(I, "_pallas_ok", lambda g: False)
    ref = I._brute_closest(geom, o, d, t_min, t_max, excl)

    bt, bp, buv = BL.query(acc, geom, o, d, t_min, t_max, excl, 1, False)
    valid = np.asarray(bp) >= 0
    np.testing.assert_array_equal(valid, np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(bp)[valid],
                                  np.asarray(ref.prim)[valid])
    np.testing.assert_allclose(np.asarray(bt)[valid],
                               np.asarray(ref.t)[valid], rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(buv)[valid],
                               np.asarray(ref.uv)[valid], atol=1e-4)
