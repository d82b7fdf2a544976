"""Break hit_legacy's non-traversal cost into its gather/math components.

Usage:  python scripts/profile_attrs.py [--n 230400]
"""

import argparse
import os
import sys
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=230400)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from learn_path_tracing_tpu.io.texture import sample_bilinear_strips
    from learn_path_tracing_tpu.scene.legacy_world import (
        LegacyWorld, environment_color)
    from learn_path_tracing_tpu.stages.legacy_common import make_asset_path_map
    from learn_path_tracing_tpu.utils.benchlib import time_fn

    world = LegacyWorld()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        wd = world.load("/root/reference/legacy/Yoimiya.world.npy",
                        path_map=make_asset_path_map())

    n = args.n
    key = jax.random.PRNGKey(0)
    pidx = jax.random.randint(key, (n,), 0, wd.tri_attr.shape[0])
    u = jax.random.uniform(jax.random.PRNGKey(1), (n,))
    v = jax.random.uniform(jax.random.PRNGKey(2), (n,))
    tex = jax.random.randint(jax.random.PRNGKey(3), (n,), 0,
                             wd.atlas.info_low.shape[0], dtype=jnp.int32)
    point = jax.random.normal(jax.random.PRNGKey(4), (n, 3))
    rd = jax.random.normal(jax.random.PRNGKey(5), (n, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    @jax.jit
    def tri_gather(pidx):
        return jnp.take(wd.tri_attr, pidx, axis=0)

    row = tri_gather(pidx)

    @jax.jit
    def bary_math(row, point):
        from learn_path_tracing_tpu.geometry.triangle import (
            triangle_barycentrics)
        p1, p2, p3 = row[:, 0:3], row[:, 3:6], row[:, 6:9]
        n0, n1, n2 = row[:, 9:12], row[:, 12:15], row[:, 15:18]
        uv0, uv1, uv2 = row[:, 18:20], row[:, 20:22], row[:, 22:24]
        w1, w2, w3 = triangle_barycentrics(p1, p2, p3, point)
        sm_n = w1[:, None] * n0 + w2[:, None] * n1 + w3[:, None] * n2
        sm_n = sm_n / jnp.maximum(
            jnp.sqrt(jnp.sum(sm_n * sm_n, -1, keepdims=True)), 1e-20)
        sm_uv = w1[:, None] * uv0 + w2[:, None] * uv1 + w3[:, None] * uv2
        return sm_n, sm_uv

    @jax.jit
    def tap(atlas, tex, u, v):
        return sample_bilinear_strips(atlas, tex, u, v, channels=8)

    @jax.jit
    def env(envs, rd):
        return environment_color(envs, wd.env_id, rd)

    for name, f, fargs in [
        ("tri_row_gather", tri_gather, (pidx,)),
        ("bary_math", bary_math, (row, point)),
        ("strip_tap_x8", tap, (wd.atlas, tex, u, v)),
        ("environment", env, (wd.envs, rd)),
    ]:
        dt, _ = time_fn(f, *fargs, iters=4)
        print(f"{name:18s} {dt * 1e3:8.2f} ms  ({n / dt / 1e6:8.1f} Mlanes/s)",
              flush=True)


if __name__ == "__main__":
    main()
