"""Native packed-dataset format (replaces the reference's LMDB dependency).

A `.pack` file is a single memory-mapped file holding many small records
(encoded images) plus a JSON footer index. Design goals, TPU-host-first:

- zero-copy reads: `get()` returns a memoryview slice of one mmap — no
  syscalls per record, page cache shared across loader threads,
- one file per dataset (fast to ship to TPU VM local disk),
- append-only writer usable from the data-prep scripts
  (parity with the reference's LMDB tooling, lmdb_util.py:12-183).

Layout: [MAGIC(8)] [record bytes ...] [json index] [index_size u64] [MAGIC(8)]
"""

from __future__ import annotations

import json
import mmap
import os
import struct

MAGIC = b"TRTPUPK1"


class PackWriter:
    def __init__(self, path: str) -> None:
        self._path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "wb")
        self._f.write(MAGIC)
        self._index: dict[str, tuple[int, int]] = {}
        self._meta: dict[str, str] = {}

    def put(self, key: str, data: bytes, meta: str | None = None) -> None:
        offset = self._f.tell()
        self._f.write(data)
        self._index[key] = (offset, len(data))
        if meta is not None:
            self._meta[key] = meta

    def close(self) -> None:
        footer = json.dumps({"index": self._index, "meta": self._meta}).encode("utf-8")
        self._f.write(footer)
        self._f.write(struct.pack("<Q", len(footer)))
        self._f.write(MAGIC)
        self._f.close()

    def __enter__(self) -> PackWriter:
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class PackReader:
    def __init__(self, path: str) -> None:
        self._path = path
        self._file = open(path, "rb")
        self._mm = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        if self._mm[:8] != MAGIC or self._mm[-8:] != MAGIC:
            raise ValueError(f"{path} is not a valid .pack file")
        (footer_len,) = struct.unpack("<Q", self._mm[-16:-8])
        footer = json.loads(self._mm[-16 - footer_len : -16].decode("utf-8"))
        self._index: dict[str, list[int]] = footer["index"]
        self.meta: dict[str, str] = footer.get("meta", {})

    def keys(self) -> list[str]:
        return list(self._index)

    def __len__(self) -> int:
        return len(self._index)

    def __contains__(self, key: str) -> bool:
        return key in self._index

    def get(self, key: str) -> bytes:
        offset, length = self._index[key]
        return self._mm[offset : offset + length]

    def get_view(self, key: str) -> memoryview:
        offset, length = self._index[key]
        return memoryview(self._mm)[offset : offset + length]

    def close(self) -> None:
        self._mm.close()
        self._file.close()


def make_pack_from_imgs(
    img_dir: str,
    pack_path: str,
    suffixes: tuple[str, ...] = (".png", ".jpg", ".jpeg", ".webp"),
    recursive: bool = True,
) -> int:
    """Build a .pack from an image folder; records metadata '<h>,<w>,<c>' per key."""
    import cv2
    import numpy as np

    from trainner_redux_tpu.utils.misc import scandir

    count = 0
    with PackWriter(pack_path) as w:
        for rel in sorted(scandir(img_dir, suffix=suffixes, recursive=recursive)):
            full = os.path.join(img_dir, rel)
            with open(full, "rb") as f:
                data = f.read()
            img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_UNCHANGED)
            key = os.path.splitext(rel)[0]
            meta = f"{img.shape[0]},{img.shape[1]},{img.shape[2] if img.ndim == 3 else 1}"
            w.put(key, data, meta)
            count += 1
    return count
