"""Legacy stage 15: the full module — OBJ + MTL textures + env, SAH BVH
build, ``.world.npy`` save, progressive accumulation
(/root/reference/legacy/PT_in_one_weekend/15_module.py:1048-1070: Yoimiya
character scene at fov 30, camera (0,8,-30) → (0,8,0), accumulating
32 spp per render() call).

    python -m learn_path_tracing_tpu.stages.l15_module --passes 4
"""

import os
import sys
import warnings

import jax
import numpy as np

from ..camera import LegacyCamera
from ..io.obj import load_obj
from ..scene.legacy_world import LegacyWorld
from ..viewer.progressive import ProgressiveRenderer
from .common import parse_args
from ..utils.config import STAGE_CONFIGS
from .legacy_common import make_asset_path_map, save_frame

ASSETS = "/root/reference/assets"


def build_yoimiya_world(save_path=None):
    path_map = make_asset_path_map()
    obj_path = os.path.join(ASSETS, "models/Yoimiya/Yoimiya_ShapeChange.obj")
    # rotate(pi, 0): yaw 180° about +y (15_module.py:1059)
    rot = np.array([[-1, 0, 0], [0, 1, 0], [0, 0, -1]], np.float64)
    mesh = load_obj(obj_path, texture_start_id=1, flip_z=True,
                    flip_textcoord=True, transform=rot)

    world = LegacyWorld()
    world.environments.add("./textures/cayley_interior_2k.exr", 0,
                           size=(2048, 1024))
    for tex in mesh.textures:
        world.textures.add(tex["file_path"], tex["id"])
    world.add_mesh(mesh)
    world.set_environment(0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        wd = world.build(path_map=path_map)
    if save_path:
        world.save(save_path)
        print(f"saved scene cache: {save_path}")
    return wd


def main():
    argv = sys.argv[1:]
    passes = 2
    if "--passes" in argv:
        i = argv.index("--passes")
        passes = int(argv[i + 1])
        del argv[i:i + 2]
    sys.argv[1:] = argv

    args = parse_args(STAGE_CONFIGS["l15"], description=__doc__)
    res = (args.width, args.height)

    wd = build_yoimiya_world(save_path="outputs/Yoimiya.world.npy")

    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))

    pr = ProgressiveRenderer(wd, cam, res, spp_per_frame=args.spp,
                             limit=args.limit, bsdf="legacy", scene="legacy")
    for i in range(passes):
        frame = pr.render(moved=(i == 0))
        save_frame(jax.block_until_ready(frame),
                   args.out or "outputs/l15_module.png")
        print(f"pass {i + 1}/{passes}: total spp={pr.spp}")


if __name__ == "__main__":
    main()
