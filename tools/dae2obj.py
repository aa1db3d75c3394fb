"""Convert a COLLADA (.dae) mesh to Wavefront OBJ.

Counterpart of the reference's examples/dae2obj.py asset-prep utility,
using the framework's own loaders (no trimesh/assimp dependency).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from grasptrajopt_tpu.models.mesh import load_dae


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("input", help=".dae file")
    parser.add_argument("-o", "--output", default=None, help="output .obj path")
    args = parser.parse_args()

    out = args.output or os.path.splitext(args.input)[0] + ".obj"
    mesh = load_dae(args.input)
    with open(out, "w") as f:
        f.write(f"# converted from {os.path.basename(args.input)}\n")
        for v in mesh.vertices:
            f.write(f"v {v[0]:.8g} {v[1]:.8g} {v[2]:.8g}\n")
        for face in mesh.faces:
            f.write(f"f {face[0]+1} {face[1]+1} {face[2]+1}\n")
    print(f"wrote {out}: {mesh.vertices.shape[0]} vertices, {mesh.faces.shape[0]} faces")


if __name__ == "__main__":
    main()
