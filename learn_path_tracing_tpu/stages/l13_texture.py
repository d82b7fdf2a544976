"""Legacy stage 13: textured sphere + environment map
(/root/reference/legacy/PT_in_one_weekend/13_texture.py:638-663): one
PBR-textured sphere (sandyground1), equirect environment, camera at
(13,2,3)*0.3, fov 30. Missing assets fall back to neutral fills.
"""

import jax

from ..camera import LegacyCamera
from ..integrator.wavefront import render
from ..scene.legacy_world import LegacyWorld
from .common import parse_args
from ..utils.config import STAGE_CONFIGS
from .legacy_common import make_asset_path_map, save_frame


def main():
    args = parse_args(STAGE_CONFIGS["l13"], description=__doc__)
    res = (args.width, args.height)

    world = LegacyWorld()
    world.textures.add(
        make_asset_path_map()("./textures/sandyground1"), 0, size=(2048, 2048))
    world.environments.add(
        make_asset_path_map()("./textures/cayley_interior_2k.exr"), 0,
        size=(2048, 1024))
    world.add_sphere((0, 0, 0), 1.0, transparency=0, texture_id=0)
    world.set_environment(0)
    wd = world.build()

    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((13 * 0.3, 2 * 0.3, 3 * 0.3))
    cam.look_at((0, 0, 0))

    img, segs = render(wd, cam.params(), res, spp=args.spp, limit=args.limit,
                       seed=0, bsdf="legacy", scene="legacy")
    img = jax.jit(lambda x: x ** (1 / 2.2))(img)
    save_frame(jax.block_until_ready(img), args.out or "outputs/l13_texture.png")


if __name__ == "__main__":
    main()
