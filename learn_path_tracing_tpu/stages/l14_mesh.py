"""Legacy stage 14: triangle meshes from serialized worlds
(/root/reference/legacy/PT_in_one_weekend/14_mesh.py:1020: loads a prebuilt
``.world.npy`` instead of rebuilding the BVH). Renders any of the shipped
world files (demo/Ganyu/Zhongli/Yoimiya/...) with progressive accumulation.

    python -m learn_path_tracing_tpu.stages.l14_mesh --world Zhongli
"""

import os
import sys
import warnings

import jax

from ..camera import LegacyCamera
from ..scene.legacy_world import LegacyWorld
from ..viewer.progressive import ProgressiveRenderer
from .common import parse_args
from ..utils.config import STAGE_CONFIGS
from .legacy_common import make_asset_path_map, save_frame

REF_LEGACY = "/root/reference/legacy"


def main():
    argv = sys.argv[1:]
    world_name = "demo"
    if "--world" in argv:
        i = argv.index("--world")
        world_name = argv[i + 1]
        del argv[i:i + 2]
    sys.argv[1:] = argv

    args = parse_args(STAGE_CONFIGS["l14"], description=__doc__)
    res = (args.width, args.height)

    path = world_name if world_name.endswith(".npy") \
        else os.path.join(REF_LEGACY, f"{world_name}.world.npy")
    world = LegacyWorld()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        wd = world.load(path, path_map=make_asset_path_map())

    cam = LegacyCamera(res)
    cam.set_fov(30)
    cam.set_position((0, 8, -30))
    cam.look_at((0, 8, 0))

    pr = ProgressiveRenderer(wd, cam, res, spp_per_frame=args.spp,
                             limit=args.limit, bsdf="legacy", scene="legacy")
    frame = pr.render(moved=True)
    save_frame(jax.block_until_ready(frame),
               args.out or f"outputs/l14_{os.path.basename(path).split('.')[0]}.png")


if __name__ == "__main__":
    main()
