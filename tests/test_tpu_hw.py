"""On-hardware Pallas kernel batch (@pytest.mark.tpu).

Compiles and runs the production kernels through Mosaic on the LIVE TPU
backend and checks them against the brute-force scan oracle — the fault
class interpret-mode CI cannot catch (round 3 lost three bench numbers to
a device fault that only manifested under real Mosaic compilation at
scale). Run with:

    YAF_TPU_TESTS=1 python -m pytest tests/test_tpu_hw.py -v

Auto-skips unless jax.default_backend() == "tpu" (the default CPU test
env never reaches these).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libyafaray_tpu.accel.blocks import build_blocks
from libyafaray_tpu.accel.tiles import tiles_traverse
from libyafaray_tpu.ops import intersect as I

from test_pallas_intersect import _random_geom, _rays

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="needs the real TPU backend (set YAF_TPU_TESTS=1)")

pytestmark = [pytest.mark.tpu, tpu_only]


def _oracle(geom, o, d, t_min, t_max, excl, shadow=False):
    return I._brute_closest(geom, o, d, t_min, t_max, excl, shadow=shadow)


def _check(t, p, u, v, ref):
    valid = np.asarray(p) >= 0
    np.testing.assert_array_equal(valid, np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(p)[valid],
                                  np.asarray(ref.prim)[valid])
    np.testing.assert_allclose(np.asarray(t)[valid], np.asarray(ref.t)[valid],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(u)[valid],
                               np.asarray(ref.uv)[valid, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(v)[valid],
                               np.asarray(ref.uv)[valid, 1], atol=1e-4)


@pytest.mark.parametrize("shadow", [False, True])
def test_hw_tiles_vs_oracle(rng, shadow):
    """Compiled tiles_traverse (VMEM-resident path) on real hardware."""
    f, n = 3000, 4096
    geom = _random_geom(rng, f)
    acc = build_blocks(geom)
    o, d = _rays(rng, n)
    t_min = jnp.full(n, 1e-4)
    t_max = jnp.full(n, 1e30)
    excl = jnp.full(n, -1, jnp.int32).at[::5].set(7)
    ref = _oracle(geom, o, d, t_min, t_max, excl, shadow=shadow)
    t, p, u, v = tiles_traverse(acc.tab, acc.bmin, acc.bmax, o, d,
                                t_min, t_max, excl, shadow=shadow)
    _check(t, p, u, v, ref)


def test_hw_tiles_any_hit_and_ragged(rng):
    """any_hit variant + a ray count that is NOT a RAY_TILE multiple
    (exercises the padding lanes on hardware)."""
    f, n = 1500, 2048 + 381
    geom = _random_geom(rng, f)
    acc = build_blocks(geom)
    o, d = _rays(rng, n)
    t_min = jnp.full(n, 1e-4)
    t_max = jnp.full(n, 1e30)
    excl = jnp.full(n, -1, jnp.int32)
    ref = _oracle(geom, o, d, t_min, t_max, excl, shadow=True)
    t, p, _, _ = tiles_traverse(acc.tab, acc.bmin, acc.bmax, o, d,
                                t_min, t_max, excl, shadow=True,
                                any_hit=True)
    np.testing.assert_array_equal(np.asarray(p) >= 0, np.asarray(ref.valid))


def test_hw_tiles_instanced():
    """Instanced scene: object<-world ray transform + virtual->physical
    indirection inside the compiled kernel (the lax.cond transform path
    the round-3 VERDICT flagged as hardware-untested). Oracle: the baked
    (geometry-duplicated) scene traversed by the same compiled kernel."""
    from test_instancing import _instanced_builder
    from libyafaray_tpu.cameras import shoot_rays

    sc_true = _instanced_builder().compile("cam")
    sc_bake = _instanced_builder(mode="baked").compile("cam")
    assert sc_true.geom.inst_mat is not None
    assert sc_bake.geom.inst_mat is None, "baked scene must not instance"
    acc_t, acc_b = sc_true.blocks, sc_bake.blocks
    assert acc_t.blk_base is not None
    assert acc_b.blk_base is None

    n = 48 * 48
    ii = jnp.arange(n, dtype=jnp.uint32)
    px = (ii % 48).astype(jnp.float32) + 0.5
    py = (ii // 48).astype(jnp.float32) + 0.5
    z = jnp.zeros((n,), jnp.float32)
    o, d, _ = shoot_rays(sc_true.camera, px, py, z, z)
    t_min = jnp.full(n, 1e-4)
    t_max = jnp.full(n, 1e30)
    excl = jnp.full(n, -1, jnp.int32)
    tt, pt, _, _ = tiles_traverse(
        acc_t.tab, acc_t.bmin, acc_t.bmax, o, d, t_min, t_max, excl,
        blk_base=acc_t.blk_base, blk_minv=acc_t.blk_minv,
        id_delta=acc_t.id_delta, inv_rows=acc_t.inv_rows)
    tb, pb, _, _ = tiles_traverse(
        acc_b.tab, acc_b.bmin, acc_b.bmax, o, d, t_min, t_max, excl)
    np.testing.assert_array_equal(np.asarray(pt) >= 0, np.asarray(pb) >= 0)
    hitm = np.asarray(pt) >= 0
    np.testing.assert_allclose(np.asarray(tt)[hitm], np.asarray(tb)[hitm],
                               rtol=1e-3, atol=1e-5)


def test_hw_pallas_intersect(rng):
    """The dense Pallas Möller-Trumbore kernel on hardware."""
    from libyafaray_tpu.accel import pallas_intersect as PI
    f, n = 900, 2048
    geom = _random_geom(rng, f)
    o, d = _rays(rng, n)
    t_min = jnp.full(n, 1e-4)
    t_max = jnp.full(n, 1e30)
    excl = jnp.full(n, -1, jnp.int32)
    ref = _oracle(geom, o, d, t_min, t_max, excl)
    v0 = geom.vertices[geom.faces[:, 0]]
    v1 = geom.vertices[geom.faces[:, 1]]
    v2 = geom.vertices[geom.faces[:, 2]]
    tri = PI.pack_tris(v0, v1, v2, geom.face_vis)
    t, p, u, v = PI.mt_closest(tri, o, d, t_min, t_max, excl, shadow=False)
    _check(t, p, u, v, ref)


def test_hw_scale_no_fault(rng):
    """Round-3 fault class regression: a larger scene + several compiled
    traversals back-to-back must not fault the device. Uses a ~50k-tri
    scene at 256x256-rays scale (completes in seconds on the chip; the
    round-3 fault appeared within one pass at comparable scale)."""
    f, n = 50_000, 65_536
    geom = _random_geom(rng, f)
    acc = build_blocks(geom)
    o, d = _rays(rng, n)
    t_min = jnp.full(n, 1e-4)
    t_max = jnp.full(n, 1e30)
    excl = jnp.full(n, -1, jnp.int32)
    for shadow in (False, True):
        t, p, u, v = tiles_traverse(acc.tab, acc.bmin, acc.bmax, o, d,
                                    t_min, t_max, excl, shadow=shadow)
        jax.block_until_ready(t)
    # spot-check a small slice against the oracle (full 50k x 65k brute
    # force would dominate the test's runtime)
    m = 512
    ref = _oracle(geom, o[:m], d[:m], t_min[:m], t_max[:m], excl[:m])
    tt, pp, _, _ = tiles_traverse(acc.tab, acc.bmin, acc.bmax, o[:m], d[:m],
                                  t_min[:m], t_max[:m], excl[:m])
    valid = np.asarray(pp) >= 0
    np.testing.assert_array_equal(valid, np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(pp)[valid],
                                  np.asarray(ref.prim)[valid])


def test_hw_lbvh_small(rng):
    """LBVH correctness on hardware at small scale (it is CPU/test-tier on
    TPU — see accel docs; this guards compile+run, not performance)."""
    from libyafaray_tpu.accel import lbvh as LB
    f, n = 500, 512
    geom = _random_geom(rng, f)
    bvh = LB.build_lbvh(geom)
    o, d = _rays(rng, n)
    t_min = jnp.full(n, 1e-4)
    t_max = jnp.full(n, 1e30)
    excl = jnp.full(n, -1, jnp.int32)
    ref = _oracle(geom, o, d, t_min, t_max, excl)

    class _S:  # minimal scene shim for lbvh.traverse_closest
        pass
    s = _S()
    s.bvh = bvh
    s.geom = geom
    hit = LB.traverse_closest(s, o, d, t_min, t_max, excl)
    valid = np.asarray(hit.valid)
    np.testing.assert_array_equal(valid, np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(hit.prim)[valid],
                                  np.asarray(ref.prim)[valid])
