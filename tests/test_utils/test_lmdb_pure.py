"""Pure-Python LMDB (utils/lmdb_pure.py + lmdb_util.py): format round-trip,
overflow values, multi-level B+trees, FileClient + dataset integration."""

import numpy as np
import pytest

from trainner_redux_tpu.utils.lmdb_pure import PureLmdbReader, PureLmdbWriter


def test_roundtrip_small(tmp_path):
    env = str(tmp_path / "a.lmdb")
    w = PureLmdbWriter(env)
    items = {f"k{i:03d}".encode(): f"value-{i}".encode() * (i + 1) for i in range(20)}
    for k, v in items.items():
        w.put(k, v)
    w.close()

    with PureLmdbReader(env) as r:
        assert len(r) == 20
        for k, v in items.items():
            assert r.get(k) == v
        assert r.get(b"missing") is None
        got = dict(r.items())
        assert got == items
        assert list(r.keys()) == sorted(items)


def test_overflow_values(tmp_path):
    """Blob values (> node max) go to overflow pages."""
    env = str(tmp_path / "b.lmdb")
    rng = np.random.default_rng(0)
    items = {
        b"big1": rng.integers(0, 256, 100_000, dtype=np.uint8).tobytes(),
        b"big2": rng.integers(0, 256, 9_999, dtype=np.uint8).tobytes(),
        b"tiny": b"x",
    }
    w = PureLmdbWriter(env)
    for k, v in items.items():
        w.put(k, v)
    w.close()
    with PureLmdbReader(env) as r:
        for k, v in items.items():
            assert r.get(k) == v


def test_multilevel_btree(tmp_path):
    """Enough keys to force branch pages above the leaves."""
    env = str(tmp_path / "c.lmdb")
    items = {f"key-{i:06d}".encode(): (f"v{i}" * 50).encode() for i in range(3000)}
    w = PureLmdbWriter(env)
    for k, v in items.items():
        w.put(k, v)
    w.close()
    with PureLmdbReader(env) as r:
        assert len(r) == 3000
        for i in (0, 1, 999, 1500, 2998, 2999):
            k = f"key-{i:06d}".encode()
            assert r.get(k) == items[k]
        assert sum(1 for _ in r.keys()) == 3000


def test_file_client_lmdb_fallback(tmp_path):
    """FileClient('lmdb') works without the lmdb package via the pure
    reader (the package is absent in this image)."""
    from trainner_redux_tpu.utils.file_client import FileClient

    env = str(tmp_path / "d.lmdb")
    w = PureLmdbWriter(env)
    w.put(b"img001", b"PNGBYTES1")
    w.put(b"img002", b"PNGBYTES2")
    w.close()
    fc = FileClient("lmdb", db_paths=[env], client_keys=["gt"])
    assert fc.get("img001", "gt") == b"PNGBYTES1"
    with pytest.raises(KeyError):
        fc.get("nope", "gt")


def test_make_lmdb_from_imgs_and_dataset(tmp_path):
    """End-to-end: build an .lmdb from PNGs (reference tooling parity),
    read images back through FileClient + imfrombytes."""
    import cv2

    from trainner_redux_tpu.utils.file_client import FileClient
    from trainner_redux_tpu.utils.img_util import imfrombytes
    from trainner_redux_tpu.utils.lmdb_util import make_lmdb_from_imgs

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(0)
    names, keys = [], []
    originals = {}
    for i in range(4):
        img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        name = f"im{i}.png"
        cv2.imwrite(str(src / name), img)
        names.append(name)
        keys.append(f"im{i}")
        originals[f"im{i}"] = img
    env = str(tmp_path / "ds.lmdb")
    make_lmdb_from_imgs(str(src), env, names, keys, n_thread=2)

    meta = (tmp_path / "ds.lmdb" / "meta_info.txt").read_text().strip().splitlines()
    assert len(meta) == 4
    assert meta[0].split(" ")[1] == "(24,32,3)"

    fc = FileClient("lmdb", db_paths=[env], client_keys=["gt"])
    for key in keys:
        decoded = imfrombytes(fc.get(key, "gt"), float32=False)
        # imfrombytes returns RGB; cv2.imwrite stored BGR
        np.testing.assert_array_equal(decoded[:, :, ::-1], originals[key])


def test_paired_dataset_from_lmdb(tmp_path):
    """PairedImageDataset with io_backend lmdb: reference-style .lmdb pair
    of folders, keys auto-discovered from each meta_info.txt."""
    import cv2

    from trainner_redux_tpu.data.paired_image_dataset import PairedImageDataset
    from trainner_redux_tpu.utils.lmdb_util import make_lmdb_from_imgs
    from trainner_redux_tpu.utils.redux_options import DatasetOptions

    rng = np.random.default_rng(0)
    gt_src = tmp_path / "gt_src"
    lq_src = tmp_path / "lq_src"
    gt_src.mkdir()
    lq_src.mkdir()
    names, keys = [], []
    for i in range(3):
        gt = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        cv2.imwrite(str(gt_src / f"im{i}.png"), gt)
        cv2.imwrite(str(lq_src / f"im{i}.png"), gt[::2, ::2])
        names.append(f"im{i}.png")
        keys.append(f"im{i}")
    gt_env = str(tmp_path / "gt.lmdb")
    lq_env = str(tmp_path / "lq.lmdb")
    make_lmdb_from_imgs(str(gt_src), gt_env, names, keys, n_thread=2)
    make_lmdb_from_imgs(str(lq_src), lq_env, names, keys, n_thread=2)

    opt = DatasetOptions(
        name="lmdbtest", type="pairedimagedataset", phase="train", scale=2,
        dataroot_gt=[gt_env], dataroot_lq=[lq_env],
        io_backend={"type": "lmdb"}, gt_size=16, batch_size_per_gpu=1,
    )
    ds = PairedImageDataset(opt)
    assert len(ds) == 3
    s = ds[0]
    assert s["gt"].shape == (16, 16, 3)
    assert s["lq"].shape == (8, 8, 3)


def test_interop_with_real_lmdb(tmp_path):
    """Cross-implementation compatibility with liblmdb (the real `lmdb`
    wheel): PureLmdbWriter output must open under liblmdb and vice versa.
    The wheel is absent in the build image, so this activates on any
    CI/dev machine that has it installed."""
    lmdb = pytest.importorskip("lmdb")

    items = {f"key{i:04d}".encode(): (f"val{i}" * (i + 1)).encode() for i in range(64)}
    items[b"blob"] = bytes(range(256)) * 1024  # overflow-page value

    # pure writer -> real reader
    env_a = str(tmp_path / "pure.lmdb")
    w = PureLmdbWriter(env_a)
    for k, v in sorted(items.items()):
        w.put(k, v)
    w.close()
    with lmdb.open(env_a, readonly=True, lock=False) as env:
        with env.begin() as txn:
            assert txn.stat()["entries"] == len(items)
            for k, v in items.items():
                assert bytes(txn.get(k)) == v

    # real writer -> pure reader
    env_b = str(tmp_path / "real.lmdb")
    with lmdb.open(env_b, map_size=64 * 1024 * 1024) as env:
        with env.begin(write=True) as txn:
            for k, v in items.items():
                txn.put(k, v)
    with PureLmdbReader(env_b) as r:
        assert len(r) == len(items)
        for k, v in items.items():
            assert r.get(k) == v


def test_edge_cases(tmp_path):
    """Empty db, single entry, long keys, values at the node-size boundary."""
    env = str(tmp_path / "edge.lmdb")
    w = PureLmdbWriter(env)
    w.close()
    with PureLmdbReader(env) as r:
        assert len(r) == 0
        assert r.get(b"any") is None
        assert list(r.items()) == []

    env2 = str(tmp_path / "edge2.lmdb")
    w = PureLmdbWriter(env2)
    long_key = b"k" * 400
    w.put(long_key, b"v")
    # values straddling the inline/overflow boundary (~nodemax = 2040)
    for sz in (2000, 2024, 2032, 2040, 2048, 4095, 4096, 4097):
        w.put(f"sz{sz:05d}".encode(), bytes(sz))
    w.close()
    with PureLmdbReader(env2) as r:
        assert r.get(long_key) == b"v"
        for sz in (2000, 2024, 2032, 2040, 2048, 4095, 4096, 4097):
            v = r.get(f"sz{sz:05d}".encode())
            assert v is not None and len(v) == sz, sz
