"""LMDB dataset builders (parity: reference traiNNer/utils/lmdb_util.py:12-247).

Same artifact layout as the reference tooling:

    example.lmdb/
    |-- data.mdb          standard LMDB data file
    |-- lock.mdb
    |-- meta_info.txt     "<name>.png (h,w,c) <compress_level>" per line

Keys are the image names without extension; values are PNG-encoded bytes.
Uses the real `lmdb` package when installed, else the bundled pure-Python
writer (utils/lmdb_pure.py), which produces files liblmdb can open.
Image decode runs on a thread pool (cv2 releases the GIL) instead of the
reference's multiprocessing pool.
"""

from __future__ import annotations

import os
import os.path as osp
from concurrent.futures import ThreadPoolExecutor

import cv2


def read_img_worker(path: str, key: str, compress_level: int):
    """Read one image, PNG-encode it (reference lmdb_util.py:154-180)."""
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise ValueError(f"cannot read image {path}")
    if img.ndim == 2:
        h, w = img.shape
        c = 1
    else:
        h, w, c = img.shape
    _, img_byte = cv2.imencode(
        ".png", img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level]
    )
    return key, img_byte.tobytes(), (h, w, c)


class LmdbMaker:
    """Incremental builder (reference lmdb_util.py:183-246): `put` encoded
    bytes + shape per key, `close` finalizes data.mdb and meta_info.txt."""

    def __init__(
        self,
        lmdb_path: str,
        map_size: int = 1024**4,
        batch: int = 5000,
        compress_level: int = 1,
    ) -> None:
        if not lmdb_path.endswith(".lmdb"):
            raise ValueError("lmdb_path must end with '.lmdb'.")
        if osp.exists(lmdb_path):
            raise FileExistsError(f"Folder {lmdb_path} already exists.")
        os.makedirs(lmdb_path)
        self.lmdb_path = lmdb_path
        self.compress_level = compress_level
        try:
            import lmdb  # type: ignore

            self._env = lmdb.open(lmdb_path, map_size=map_size)
            self._txn = self._env.begin(write=True)
            self._batch = batch
            self._pure = None
        except ImportError:
            from trainner_redux_tpu.utils.lmdb_pure import PureLmdbWriter

            self._pure = PureLmdbWriter(lmdb_path)
        self._txt = open(osp.join(lmdb_path, "meta_info.txt"), "w", encoding="utf-8")
        self._count = 0

    def put(self, img_byte: bytes, key: str, img_shape: tuple) -> None:
        self._count += 1
        if self._pure is not None:
            self._pure.put(key.encode("ascii"), img_byte)
        else:
            self._txn.put(key.encode("ascii"), img_byte)
            if self._count % self._batch == 0:
                self._txn.commit()
                self._txn = self._env.begin(write=True)
        h, w, c = img_shape
        self._txt.write(f"{key}.png ({h},{w},{c}) {self.compress_level}\n")

    def close(self) -> None:
        if self._pure is not None:
            self._pure.close()
        else:
            self._txn.commit()
            self._env.close()
        self._txt.close()


def make_lmdb_from_imgs(
    data_path: str,
    lmdb_path: str,
    img_path_list: list[str],
    keys: list[str],
    batch: int = 5000,
    compress_level: int = 1,
    multiprocessing_read: bool = False,
    n_thread: int = 40,
    map_size: int | None = None,
) -> None:
    """Build an .lmdb dataset folder from images (reference :12-151)."""
    assert len(img_path_list) == len(keys), (
        "img_path_list and keys should have the same length, "
        f"but got {len(img_path_list)} and {len(keys)}"
    )
    if map_size is None:
        _, img_byte, _ = read_img_worker(
            osp.join(data_path, img_path_list[0]), keys[0], compress_level
        )
        map_size = max(len(img_byte) * len(img_path_list) * 10, 1 << 24)

    maker = LmdbMaker(lmdb_path, map_size=map_size, batch=batch,
                      compress_level=compress_level)
    with ThreadPoolExecutor(max_workers=max(1, min(n_thread, 32))) as pool:
        futures = [
            pool.submit(
                read_img_worker, osp.join(data_path, p), k, compress_level
            )
            for p, k in zip(img_path_list, keys, strict=True)
        ]
        for fut in futures:
            key, img_byte, shape = fut.result()
            maker.put(img_byte, key, shape)
    maker.close()
