"""Build a .pack record file from an image folder (the LMDB-tooling
equivalent; parity: /root/reference/scripts/data_preparation LMDB scripts +
traiNNer/utils/lmdb_util.py). Usage:
    python scripts/data_preparation/create_pack_from_imgs.py <img_dir> <out.pack>
"""

import sys

from trainner_redux_tpu.data.packfile import make_pack_from_imgs

if __name__ == "__main__":
    img_dir, out = sys.argv[1], sys.argv[2]
    n = make_pack_from_imgs(img_dir, out)
    print(f"packed {n} images into {out}")
