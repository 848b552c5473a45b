"""Create .lmdb dataset folders from image directories.

Parity: reference scripts/data_preparation/create_lmdb.py (DIV2K/REDS-style
helpers) generalized into one CLI — point it at any image folder:

    python scripts/data_preparation/create_lmdb.py \
        --input datasets/DIV2K/DIV2K_train_HR_sub \
        --output datasets/DIV2K/DIV2K_train_HR_sub.lmdb

Works without the `lmdb` package (pure-Python writer,
trainner_redux_tpu/utils/lmdb_pure.py); the produced data.mdb is standard
LMDB and readable by liblmdb.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

from trainner_redux_tpu.utils.lmdb_util import make_lmdb_from_imgs  # noqa: E402

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="image folder")
    ap.add_argument("--output", required=True, help="output .lmdb folder")
    ap.add_argument("--n-thread", type=int, default=8)
    ap.add_argument("--compress-level", type=int, default=1)
    args = ap.parse_args()

    names = sorted(
        f for f in os.listdir(args.input)
        if f.lower().endswith(IMG_EXTS)
    )
    if not names:
        raise SystemExit(f"no images under {args.input}")
    keys = [osp.splitext(n)[0] for n in names]
    print(f"{len(names)} images -> {args.output}")
    make_lmdb_from_imgs(
        args.input, args.output, names, keys,
        compress_level=args.compress_level, n_thread=args.n_thread,
    )
    print("done")


if __name__ == "__main__":
    main()
