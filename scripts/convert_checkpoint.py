"""Convert a reference torch checkpoint to the torch-free .npz format.

Usage: python scripts/convert_checkpoint.py <in.ckpt> <out.npz>
"""

import sys

sys.path.insert(0, ".")

from effi_mvs_plus_tpu.io.torch_import import save_npz

if __name__ == "__main__":
    save_npz(sys.argv[1], sys.argv[2])
    print(f"wrote {sys.argv[2]}")
