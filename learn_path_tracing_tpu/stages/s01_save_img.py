"""Stage 1: fill a UV gradient and save it (1_save_img/__main__.py:1-19)."""

import time

import jax
import jax.numpy as jnp

from ..core import image
from .common import parse_args
from ..utils.config import STAGE_CONFIGS


import functools


@functools.partial(jax.jit, static_argnums=(0, 1))
def shader(resolution_w, resolution_h):
    i = jnp.arange(resolution_w, dtype=jnp.float32)[:, None]
    j = jnp.arange(resolution_h, dtype=jnp.float32)[None, :]
    r = jnp.broadcast_to(i / resolution_w, (resolution_w, resolution_h))
    g = jnp.broadcast_to(j / resolution_h, (resolution_w, resolution_h))
    b = jnp.zeros_like(r)
    return jnp.stack([r, g, b], axis=-1)


def main():
    args = parse_args(STAGE_CONFIGS[1], description=__doc__)
    start = time.time()
    img = jax.block_until_ready(shader(args.width, args.height))
    print(f"Time elapsed: {time.time() - start:.2f}s")
    image.write_png(img, args.out or "outputs/1_save_img.png")


if __name__ == "__main__":
    main()
