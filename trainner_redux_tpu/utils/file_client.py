"""Pluggable byte-storage backends (parity: reference file_client.py:8-113).

Backends:
- disk: plain filesystem reads.
- pack: this framework's native packed-dataset format (see
  trainner_redux_tpu/data/packfile.py) — a memory-mapped record file that
  replaces the reference's LMDB dependency with an mmap design that needs no
  external library and supports zero-copy reads from the host data loader.
- lmdb: reference-dataset compatibility. Uses the real `lmdb` package when
  installed; otherwise falls back to the bundled pure-Python reader of the
  LMDB file format (utils/lmdb_pure.py), so reference LMDB datasets load
  with zero extra dependencies.
"""

from __future__ import annotations

from typing import Any


class DiskBackend:
    def get(self, filepath: str, client_key: str | None = None) -> bytes:
        with open(filepath, "rb") as f:
            return f.read()


class PackBackend:
    """Reads from .pack record files created by utils/pack_util.py."""

    def __init__(self, db_paths: list[str] | str, client_keys: list[str] | str = "default"):
        from trainner_redux_tpu.data.packfile import PackReader

        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, str):
            db_paths = [db_paths]
        self._clients = {
            key: PackReader(path) for key, path in zip(client_keys, db_paths, strict=True)
        }

    def get(self, filepath: str, client_key: str = "default") -> bytes:
        return self._clients[client_key].get(filepath)


class LmdbBackend:
    def __init__(self, db_paths: list[str] | str, client_keys: list[str] | str = "default", **kw):
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, str):
            db_paths = [db_paths]
        try:
            import lmdb  # type: ignore

            self._pure = False
            self._clients = {
                key: lmdb.open(path, readonly=True, lock=False, readahead=False, **kw)
                for key, path in zip(client_keys, db_paths, strict=True)
            }
        except ImportError:
            from trainner_redux_tpu.utils.lmdb_pure import PureLmdbReader

            self._pure = True
            self._clients = {
                key: PureLmdbReader(path)
                for key, path in zip(client_keys, db_paths, strict=True)
            }

    def get(self, filepath: str, client_key: str = "default") -> bytes:
        client = self._clients[client_key]
        if self._pure:
            value = client.get(filepath.encode("ascii"))
        else:
            with client.begin(write=False) as txn:
                value = txn.get(filepath.encode("ascii"))
        if value is None:
            raise KeyError(f"key {filepath} not found in lmdb {client_key}")
        return bytes(value)


class FileClient:
    """Dispatches reads to the configured backend."""

    _backends = {"disk": DiskBackend, "pack": PackBackend, "lmdb": LmdbBackend}

    def __init__(self, backend: str = "disk", **kwargs: Any) -> None:
        if backend not in self._backends:
            raise ValueError(
                f"Backend {backend} not supported. Supported: {sorted(self._backends)}"
            )
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath: str, client_key: str = "default") -> bytes:
        if self.backend == "disk":
            return self.client.get(filepath)
        return self.client.get(filepath, client_key)
