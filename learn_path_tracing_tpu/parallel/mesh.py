"""Multi-chip rendering over a device mesh.

The reference is single-GPU (SURVEY.md §2.3: no distributed code exists).
On TPU the workload's natural parallel axes are:

- ``tile``: data-parallel pixel tiles — zero cross-chip traffic during
  tracing; each device owns a contiguous chunk of the flat pixel axis;
- ``spp``: sample-parallel — each device renders a subset of the samples of
  *every* pixel, reduced with ``psum`` over ICI at the end.

Because the RNG is counter-based on (absolute pixel id, absolute sample
index), the sharded render computes bit-identical per-sample radiance to the
single-device path; only the cross-device sum order differs (f32 roundoff).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..camera.camera import CameraParams
from ..integrator.wavefront import trace_sample_pixels


def make_mesh(n_tile: int | None = None, n_spp: int = 1, devices=None) -> Mesh:
    """Build a ('tile', 'spp') mesh. Defaults to all devices on the tile axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_tile is None:
        n_tile = len(devices) // n_spp
    if n_tile * n_spp != len(devices):
        raise ValueError(
            f"mesh {n_tile}x{n_spp} != {len(devices)} devices")
    import numpy as np

    arr = np.array(devices).reshape(n_tile, n_spp)
    return Mesh(arr, ("tile", "spp"))


def render_sharded(world_data, cam: CameraParams, resolution, spp: int,
                   mesh: Mesh, limit: int = 32, seed=0, bsdf: str = "modern",
                   camera_model: str = "thinlens", scene: str = "spheres",
                   hit_backend: str = "auto"):
    """Render across the mesh; returns (image f32[W,H,3] sharded over tiles,
    segments f32 total).

    ``spp`` must divide by the spp-axis size; the pixel axis is padded to a
    tile multiple (padding pixels trace real rays whose results are dropped).
    """
    w, h = resolution
    n = w * h
    n_tile = mesh.shape["tile"]
    n_spp_shards = mesh.shape["spp"]
    if spp % n_spp_shards:
        raise ValueError(f"spp={spp} not divisible by spp axis {n_spp_shards}")
    spp_local = spp // n_spp_shards
    n_pad = -(-n // n_tile) * n_tile

    pixel_ids = jnp.arange(n_pad, dtype=jnp.uint32)
    # padding ids clamp to the last real pixel: valid math, discarded output
    pixel_ids = jnp.minimum(pixel_ids, jnp.uint32(n - 1))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("tile")),
        out_specs=(P("tile"), P()),
        # scan carries mix device-varying (radiance) and invariant (counters)
        # leaves; skip the varying-manual-axes check
        check_vma=False,
    )
    def shard_fn(wd, cp, pix_chunk):
        s0 = jax.lax.axis_index("spp") * spp_local

        def body(k, carry):
            acc, segs = carry
            radiance, segments = trace_sample_pixels(
                wd, cp, resolution, pix_chunk, seed, s0 + k, limit,
                bsdf=bsdf, camera_model=camera_model, scene=scene,
                hit_backend=hit_backend,
            )
            return acc + radiance, segs + segments

        acc0 = jnp.zeros((pix_chunk.shape[0], 3), jnp.float32)
        acc, segs = jax.lax.fori_loop(0, spp_local, body, (acc0, jnp.float32(0.0)))
        acc = jax.lax.psum(acc, "spp")
        segs = jax.lax.psum(segs, ("tile", "spp"))
        return acc, segs

    acc, segs = shard_fn(world_data, cam, pixel_ids)
    img = (acc[:n] / spp).reshape(w, h, 3)
    return img, segs


@partial(jax.jit, static_argnames=("resolution", "spp", "limit", "bsdf",
                                   "camera_model", "scene", "hit_backend", "mesh"))
def _render_sharded_jit(world_data, cam, resolution, spp, mesh, limit, seed,
                        bsdf, camera_model, scene, hit_backend):
    return render_sharded(world_data, cam, resolution, spp, mesh, limit=limit,
                          seed=seed, bsdf=bsdf, camera_model=camera_model,
                          scene=scene, hit_backend=hit_backend)


def render_multichip(world_data, cam: CameraParams, resolution, spp: int,
                     mesh: Mesh, limit: int = 32, seed=0, bsdf: str = "modern",
                     camera_model: str = "thinlens", scene: str = "spheres",
                     hit_backend: str = "auto"):
    """Jitted entry point for multi-chip rendering."""
    return _render_sharded_jit(world_data, cam, resolution, spp, mesh, limit,
                               seed, bsdf, camera_model, scene, hit_backend)
