"""Pure-Python LMDB file-format access (no `lmdb` package required).

The reference ships LMDB datasets (traiNNer/utils/lmdb_util.py builds them,
file_client.py reads them); this image has no `lmdb` wheel and zero egress,
so the on-disk format (LMDB data version 1, the stable format since 2011) is
implemented directly:

- `PureLmdbReader`: mmap + B+tree walk of `data.mdb` — full iteration, key
  lookup, overflow-page values. Read-only; enough for dataset serving.
- `PureLmdbWriter`: single-transaction bulk writer producing a standard
  `data.mdb` (sorted keys, overflow pages for blob values, duplicate meta
  pages) that the real liblmdb can open.

Layout constants follow lmdb's mdb.c (MDB_page / MDB_node / MDB_meta / MDB_db
structs); values are little-endian, page header is 16 bytes, node header 8.
Round-trip tested in tests/test_utils/test_lmdb_pure.py. Sub-databases,
DUPSORT and LEAF2 pages are out of scope (image datasets use none of them)
and raise if encountered.
"""

from __future__ import annotations

import mmap
import os
import struct

MDB_MAGIC = 0xBEEFC0DE
MDB_VERSION = 1
PAGEHDRSZ = 16
P_BRANCH, P_LEAF, P_OVERFLOW, P_META, P_LEAF2, P_SUBP = (
    0x01, 0x02, 0x04, 0x08, 0x20, 0x40,
)
F_BIGDATA, F_SUBDATA, F_DUPDATA = 0x01, 0x02, 0x04
P_INVALID = 0xFFFFFFFFFFFFFFFF

# MDB_db: pad u32, flags u16, depth u16, branch u64, leaf u64, overflow u64,
# entries u64, root u64  (48 bytes)
_DB = struct.Struct("<IHHQQQQQ")
# meta after page header: magic u32, version u32, address u64, mapsize u64
_META_HEAD = struct.Struct("<IIQQ")


class PureLmdbReader:
    """Read-only access to an LMDB environment directory or data file."""

    def __init__(self, path: str) -> None:
        if os.path.isdir(path):
            path = os.path.join(path, "data.mdb")
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        meta = self._pick_meta()
        self.psize = meta["psize"]
        self._root = meta["root"]
        self.entries = meta["entries"]
        self._depth = meta["depth"]

    # -- file structure ---------------------------------------------------

    def _read_meta(self, pgno: int, psize_guess: int) -> dict | None:
        off = pgno * psize_guess + PAGEHDRSZ
        try:
            magic, version, _addr, _mapsize = _META_HEAD.unpack_from(self._mm, off)
        except struct.error:
            return None
        if magic != MDB_MAGIC or version != MDB_VERSION:
            return None
        dbs_off = off + _META_HEAD.size
        free = _DB.unpack_from(self._mm, dbs_off)
        main = _DB.unpack_from(self._mm, dbs_off + _DB.size)
        last_pg, txnid = struct.unpack_from(
            "<QQ", self._mm, dbs_off + 2 * _DB.size
        )
        return {
            "psize": free[0],
            "depth": main[2],
            "entries": main[6],
            "root": main[7],
            "txnid": txnid,
            "last_pg": last_pg,
        }

    def _pick_meta(self) -> dict:
        # page size is recorded in meta itself; read meta0 assuming the
        # minimum page size, then re-read both metas with the real one
        probe = self._read_meta(0, 4096)
        if probe is None:
            for ps in (512, 1024, 2048, 8192, 16384, 32768, 65536):
                probe = self._read_meta(0, ps)
                if probe is not None:
                    break
        if probe is None:
            raise ValueError("not an LMDB data file (bad magic)")
        psize = probe["psize"]
        metas = [m for m in (self._read_meta(0, psize), self._read_meta(1, psize)) if m]
        return max(metas, key=lambda m: m["txnid"])

    def _page(self, pgno: int) -> tuple[int, int, int, int]:
        """-> (offset, flags, lower, upper)."""
        off = pgno * self.psize
        flags, lower, upper = struct.unpack_from("<HHH", self._mm, off + 10)
        return off, flags, lower, upper

    def _node(self, page_off: int, ptr: int) -> tuple[bytes, int, int, int]:
        """-> (key, lo|hi<<16, node_flags, data_offset_after_key)."""
        noff = page_off + ptr
        lo, hi, nflags, ksize = struct.unpack_from("<HHHH", self._mm, noff)
        key = bytes(self._mm[noff + 8 : noff + 8 + ksize])
        return key, lo | (hi << 16), nflags, noff + 8 + ksize

    def _nkeys(self, lower: int) -> int:
        return (lower - PAGEHDRSZ) // 2

    def _ptrs(self, page_off: int, n: int) -> list[int]:
        return list(struct.unpack_from(f"<{n}H", self._mm, page_off + PAGEHDRSZ))

    def _branch_pgno(self, page_off: int, ptr: int) -> tuple[bytes, int]:
        noff = page_off + ptr
        lo, hi, fl, ksize = struct.unpack_from("<HHHH", self._mm, noff)
        pgno = lo | (hi << 16) | (fl << 32)
        key = bytes(self._mm[noff + 8 : noff + 8 + ksize])
        return key, pgno

    def _leaf_value(self, sz: int, nflags: int, doff: int) -> bytes:
        if nflags & (F_SUBDATA | F_DUPDATA):
            raise NotImplementedError("DUPSORT/sub-databases not supported")
        if nflags & F_BIGDATA:
            (opgno,) = struct.unpack_from("<Q", self._mm, doff)
            ooff = opgno * self.psize
            oflags = struct.unpack_from("<H", self._mm, ooff + 10)[0]
            if not oflags & P_OVERFLOW:
                raise ValueError("corrupt LMDB: expected overflow page")
            return bytes(self._mm[ooff + PAGEHDRSZ : ooff + PAGEHDRSZ + sz])
        return bytes(self._mm[doff : doff + sz])

    # -- public API -------------------------------------------------------

    def get(self, key: bytes) -> bytes | None:
        if self._root == P_INVALID:
            return None
        pgno = self._root
        for _ in range(64):  # depth bound
            off, flags, lower, _upper = self._page(pgno)
            n = self._nkeys(lower)
            ptrs = self._ptrs(off, n)
            if flags & P_LEAF2:
                raise NotImplementedError("LEAF2 pages not supported")
            if flags & P_BRANCH:
                # rightmost child whose key <= target (node 0 key is empty)
                child = None
                for i in range(n - 1, -1, -1):
                    k, pg = self._branch_pgno(off, ptrs[i])
                    if i == 0 or k <= key:
                        child = pg
                        break
                pgno = child
                continue
            if flags & P_LEAF:
                for p in ptrs:
                    k, sz, nf, doff = self._node(off, p)
                    if k == key:
                        return self._leaf_value(sz, nf, doff)
                return None
            raise ValueError(f"unexpected page flags 0x{flags:x}")
        raise ValueError("LMDB tree too deep (corrupt?)")

    def items(self):
        """Yield (key, value) in key order."""
        if self._root == P_INVALID:
            return
        stack = [self._root]
        while stack:
            pgno = stack.pop()
            off, flags, lower, _ = self._page(pgno)
            n = self._nkeys(lower)
            ptrs = self._ptrs(off, n)
            if flags & P_BRANCH:
                for p in reversed(ptrs):
                    stack.append(self._branch_pgno(off, p)[1])
            elif flags & P_LEAF:
                for p in ptrs:
                    k, sz, nf, doff = self._node(off, p)
                    yield k, self._leaf_value(sz, nf, doff)
            else:
                raise ValueError(f"unexpected page flags 0x{flags:x}")

    def keys(self):
        for k, _v in self.items():
            yield k

    def __len__(self) -> int:
        return self.entries

    def close(self) -> None:
        self._mm.close()
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a) -> None:
        self.close()


class PureLmdbWriter:
    """Single-transaction bulk writer: collect puts, `close()` writes a
    standard data.mdb (keys sorted, blob values on overflow pages)."""

    def __init__(self, env_dir: str, psize: int = 4096) -> None:
        os.makedirs(env_dir, exist_ok=True)
        self.path = os.path.join(env_dir, "data.mdb")
        self.psize = psize
        self._items: dict[bytes, bytes] = {}
        # node must leave room for 2 nodes/page (lmdb's me_nodemax rule)
        self._nodemax = ((psize - PAGEHDRSZ) // 2) & ~1

    def put(self, key: bytes, value: bytes) -> None:
        if not isinstance(key, bytes):
            key = bytes(key)
        self._items[key] = bytes(value)

    def _page_header(self, pgno: int, flags: int, lower: int, upper: int) -> bytes:
        return struct.pack("<QHHHH", pgno, 0, flags, lower, upper)

    def _overflow_header(self, pgno: int, npages: int) -> bytes:
        return struct.pack("<QHHI", pgno, 0, P_OVERFLOW, npages)

    def close(self) -> None:
        psize = self.psize
        items = sorted(self._items.items())
        pages: dict[int, bytes] = {}
        next_pg = 2  # 0,1 are metas
        n_overflow = 0

        # 1) values -> overflow pages where the node would not fit
        encoded = []  # (key, node_flags, data_bytes)
        for k, v in items:
            node_sz = 8 + len(k) + len(v)
            if node_sz > self._nodemax:
                npages = (len(v) + PAGEHDRSZ + psize - 1) // psize
                buf = self._overflow_header(next_pg, npages) + v
                buf += b"\0" * (npages * psize - len(buf))
                for j in range(npages):
                    pages[next_pg + j] = buf[j * psize : (j + 1) * psize]
                encoded.append((k, F_BIGDATA, struct.pack("<Q", next_pg), len(v)))
                next_pg += npages
                n_overflow += npages
            else:
                encoded.append((k, 0, v, len(v)))

        # 2) leaf pages: fill while the ptr array + nodes fit
        def build_level(nodes, leaf: bool):
            """nodes: list of (key, nflags, payload, dsize) for leaves or
            (key, child_pgno) for branches. Returns list of (first_key, pgno)."""
            nonlocal next_pg
            out = []
            i = 0
            while i < len(nodes) or (not nodes and not out):
                taken = []
                used = 0
                while i < len(nodes):
                    if leaf:
                        k, nf, payload, _ = nodes[i]
                        sz = 8 + len(k) + len(payload)
                    else:
                        k, _child = nodes[i]
                        if not taken:
                            k = b""  # leftmost branch key is empty
                        sz = 8 + len(k)
                    sz = (sz + 1) & ~1  # even alignment
                    if taken and PAGEHDRSZ + 2 * (len(taken) + 1) + used + sz > psize:
                        break
                    taken.append(i)
                    used += sz
                    i += 1
                pgno = next_pg
                next_pg += 1
                body = bytearray(psize)
                ptrs = []
                top = psize
                for idx in taken:
                    if leaf:
                        k, nf, payload, dsize = nodes[idx]
                        node = struct.pack(
                            "<HHHH", dsize & 0xFFFF, (dsize >> 16) & 0xFFFF,
                            nf, len(k),
                        ) + k + payload
                    else:
                        k, child = nodes[idx]
                        if idx == taken[0]:
                            k = b""
                        node = struct.pack(
                            "<HHHH", child & 0xFFFF, (child >> 16) & 0xFFFF,
                            (child >> 32) & 0xFFFF, len(k),
                        ) + k
                    nsz = (len(node) + 1) & ~1
                    top -= nsz
                    body[top : top + len(node)] = node
                    ptrs.append(top)
                lower = PAGEHDRSZ + 2 * len(ptrs)
                hdr = self._page_header(
                    pgno, P_LEAF if leaf else P_BRANCH, lower, top
                )
                body[: len(hdr)] = hdr
                struct.pack_into(f"<{len(ptrs)}H", body, PAGEHDRSZ, *ptrs)
                pages[pgno] = bytes(body)
                first_key = nodes[taken[0]][0] if taken else b""
                out.append((first_key, pgno))
                if not nodes:
                    break
            return out

        depth = 0
        root = P_INVALID
        n_leaf = n_branch = 0
        if encoded:
            level = build_level(encoded, leaf=True)
            n_leaf = len(level)
            depth = 1
            while len(level) > 1:
                level = build_level(level, leaf=False)
                depth += 1
            root = level[0][1]
            n_branch = next_pg - 2 - n_overflow - n_leaf

        # 3) metas (both slots identical, txnid 1)
        main_db = _DB.pack(0, 0, depth, n_branch, n_leaf, n_overflow,
                           len(items), root)
        free_db = _DB.pack(psize, 0, 0, 0, 0, 0, 0, P_INVALID)
        mapsize = max(next_pg * psize, 1 << 20)
        for pg in (0, 1):
            meta = (
                self._page_header(pg, P_META, 0, 0)
                + _META_HEAD.pack(MDB_MAGIC, MDB_VERSION, 0, mapsize)
                + free_db
                + main_db
                + struct.pack("<QQ", next_pg - 1, 1)
            )
            pages[pg] = meta + b"\0" * (psize - len(meta))

        with open(self.path, "wb") as f:
            for pg in range(next_pg):
                f.write(pages.get(pg, b"\0" * psize))
        # companion lock file, as liblmdb creates
        open(os.path.join(os.path.dirname(self.path), "lock.mdb"), "wb").close()
