"""Spatially-sharded band-tiled path vs the single-chip tiled path.

VERDICT r3 #4: bands distributed across the mesh's spatial axis must
reproduce the single-chip tiled kernels bit-for-bit — including label
bit-equality at the 2 MP ship shape ([4, 1080, 1920] over a 2x4 mesh).
Runs on the virtual 8-device CPU mesh (conftest); Pallas kernels in
interpret mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from heimdall_tpu.parallel.mesh import make_mesh
from heimdall_tpu.parallel.sharding import shard_batch
from heimdall_tpu.parallel.tiled_sp import (
    fill_holes_tiled_sp, connected_components_tiled_sp,
    make_tiled_spatial_step, pick_band)
from heimdall_tpu.ops import ccl_tiled
from heimdall_tpu.detectors.contamination_detector import (
    contamination_program)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


def _blob_mask(n, h, w, seed=0, blobs=6):
    """Random multi-blob masks incl. shard-crossing geometry."""
    rng = np.random.RandomState(seed)
    m = np.zeros((n, h, w), bool)
    yy, xx = np.ogrid[:h, :w]
    for i in range(n):
        for _ in range(blobs):
            y, x = rng.randint(0, h), rng.randint(0, w)
            r = rng.randint(2, max(3, h // 6))
            m[i] |= (yy - y) ** 2 + (xx - x) ** 2 <= r * r
        # a full-height bar to force cross-shard merges
        c = rng.randint(1, w - 2)
        m[i, :, c:c + 2] = True
    return m


def _frames(n, h, w, seed=0):
    rng = np.random.RandomState(seed)
    frames = np.full((n, h, w, 3), 220, np.uint8)
    yy, xx = np.ogrid[:h, :w]
    for i in range(n):
        for _ in range(3):
            y, x = rng.randint(6, h - 6), rng.randint(6, w - 6)
            r = rng.randint(3, 8)
            v = rng.randint(0, 60)
            m = (yy - y) ** 2 + (xx - x) ** 2 <= r * r
            frames[i][m] = (v, v, v)
    return frames


def _sharded_fill_labels(mesh, mask, band, max_blobs=16):
    n_sp = mesh.shape["spatial"]
    H = mask.shape[1]

    def local(m):
        axes = ("data", "spatial")
        filled = fill_holes_tiled_sp(m, band, H, "spatial", interpret=True,
                                     sync_axes=axes)
        lab, rl, nb, _sl, _sc = connected_components_tiled_sp(
            filled, band, H, "spatial", max_blobs, interpret=True,
            sync_axes=axes)
        return filled, lab, rl, nb

    f = shard_map(
        local, mesh=mesh,
        in_specs=(P("data", "spatial"),),
        out_specs=(P("data", "spatial"), P("data", "spatial"),
                   P("data"), P("data")),
        check_vma=False)
    sharded_mask = jax.device_put(
        mask, NamedSharding(mesh, P("data", "spatial")))
    return jax.jit(f)(sharded_mask)


@needs_8
@pytest.mark.parametrize("data,spatial,band", [(4, 2, 8), (2, 4, 8),
                                               (1, 8, 4)])
def test_fill_and_labels_match_single_chip(data, spatial, band):
    mesh = make_mesh(data=data, spatial=spatial)
    n = max(2, data)
    h, w = 32 * spatial, 64
    mask = _blob_mask(n, h, w, seed=spatial)

    filled_sh, lab_sh, rl_sh, nb_sh = _sharded_fill_labels(mesh, mask, band)

    filled_ref = ccl_tiled.fill_holes_tiled(jnp.asarray(mask), band=16,
                                            interpret=True)
    lab_ref, rl_ref, nb_ref = ccl_tiled.connected_components_tiled(
        filled_ref, connectivity=8, band=16, adaptive=True,
        interpret=True, return_roots=16)

    np.testing.assert_array_equal(np.asarray(filled_sh),
                                  np.asarray(filled_ref))
    np.testing.assert_array_equal(np.asarray(lab_sh), np.asarray(lab_ref))
    np.testing.assert_array_equal(np.asarray(rl_sh), np.asarray(rl_ref))
    np.testing.assert_array_equal(np.asarray(nb_sh), np.asarray(nb_ref))


@needs_8
@pytest.mark.parametrize("data,spatial", [(4, 2), (2, 4)])
def test_full_step_matches_single_chip(data, spatial):
    mesh = make_mesh(data=data, spatial=spatial)
    n = data * 2
    h, w = 24 * spatial, 64
    frames = _frames(n, h, w, seed=spatial)

    step = make_tiled_spatial_step(mesh, band=8, max_blobs=16)
    t_sh, conf_sh, acc_sh = step(
        shard_batch(mesh, frames, spatial=True), 15, 0.0, 1e9, 0.0)

    t_ref, conf_ref, acc_ref = contamination_program(
        jnp.asarray(frames), jnp.int32(15), jnp.float32(0.0),
        jnp.float32(1e9), jnp.float32(0.0), max_blobs=16, tiled_band=8)

    for f in t_ref._fields:
        np.testing.assert_allclose(np.asarray(getattr(t_sh, f)),
                                   np.asarray(getattr(t_ref, f)),
                                   atol=1e-5, err_msg=f)
    np.testing.assert_allclose(np.asarray(conf_sh), np.asarray(conf_ref),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(acc_sh), np.asarray(acc_ref))


def test_pick_band():
    # bands must be Mosaic-blockable: % 8 == 0, or the full shard height
    # (the r5 hardware check caught band 90 failing to lower on TPU)
    assert pick_band(270, 128) == 270     # no 8-aligned divisor <= 128
    assert pick_band(540, 128) == 540     # 540 = 4*135: 8 never divides
    assert pick_band(128, 128) == 128
    assert pick_band(1080, 128) == 120
    assert pick_band(512, 128) == 128
    assert pick_band(7, 128) == 7         # == Hl: full-height band


@needs_8
def test_labels_bitequal_2mp_ship_shape():
    """VERDICT r3 #4 'Done' bar: label bit-equality with the single-chip
    tiled path at [4, 1080, 1920] over a 2x4 (data x spatial) mesh.
    Hl = 270 -> band 90; components span all four shards (full-height
    bars in the mask).  Slow on CPU (interpret-mode Pallas at 2 MP)."""
    mesh = make_mesh(data=2, spatial=4)
    mask = _blob_mask(4, 1080, 1920, seed=7, blobs=10)
    band = pick_band(1080 // 4, 128)

    filled_sh, lab_sh, rl_sh, nb_sh = _sharded_fill_labels(
        mesh, mask, band, max_blobs=32)

    filled_ref = ccl_tiled.fill_holes_tiled(jnp.asarray(mask), band=128,
                                            interpret=True)
    lab_ref, rl_ref, nb_ref = ccl_tiled.connected_components_tiled(
        filled_ref, connectivity=8, band=128, adaptive=True,
        interpret=True, return_roots=32)

    np.testing.assert_array_equal(np.asarray(filled_sh),
                                  np.asarray(filled_ref))
    np.testing.assert_array_equal(np.asarray(lab_sh), np.asarray(lab_ref))
    np.testing.assert_array_equal(np.asarray(rl_sh), np.asarray(rl_ref))
    np.testing.assert_array_equal(np.asarray(nb_sh), np.asarray(nb_ref))
