"""Convert a reference NeuPAN DUNE ``.pth`` checkpoint to our ``.npz`` format.

Usage: python scripts/convert_checkpoint.py <in.pth> <out.npz>
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

from neupan_tpu.models import obs_point_net  # noqa: E402

if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    params = obs_point_net.load_checkpoint(src)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    obs_point_net.save_checkpoint(dst, params)
    print(f"converted {src} -> {dst}")
