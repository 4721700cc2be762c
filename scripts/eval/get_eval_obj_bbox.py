"""Print the axis-aligned bounding box of a simulator asset mesh.

Used when adding new distractor/target objects to the Simpler probing
suites: task configs need object extents to place objects without
collisions. Generic argparse version of the reference's hardcoded snippet
(`scripts/eval/get_eval_obj_bbox.py`).

Usage: python scripts/eval/get_eval_obj_bbox.py path/to/asset.glb [more...]
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("meshes", nargs="+", help="mesh files (glb/obj/stl/...)")
    args = ap.parse_args()
    try:
        import trimesh
    except ImportError:
        print("trimesh is not installed in this environment (simulator-side "
              "tooling); run inside the eval client venv", file=sys.stderr)
        return 1

    for path in args.meshes:
        # force='mesh' merges a single-mesh scene into one Trimesh
        mesh = trimesh.load(path, force="mesh")
        (xmin, ymin, zmin), (xmax, ymax, zmax) = mesh.bounds
        sx, sy, sz = mesh.bounds[1] - mesh.bounds[0]
        print(f"{path}:")
        print(f"  X range: {xmin:.3f} -> {xmax:.3f}")
        print(f"  Y range: {ymin:.3f} -> {ymax:.3f}")
        print(f"  Z range: {zmin:.3f} -> {zmax:.3f}")
        print(f"  Size:  dX={sx:.3f}, dY={sy:.3f}, dZ={sz:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
