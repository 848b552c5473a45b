"""Subprocess smoke tests for the user-facing CLI tools (slow suite):
inference.py, calculate_psnr_ssim.py, create_lmdb.py, generate docs."""

import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = osp.abspath(osp.join(osp.dirname(__file__), "..", ".."))


def _run(args, timeout=420):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    return subprocess.run(
        [sys.executable, *args], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(2):
        cv2.imwrite(
            str(d / f"i{i}.png"),
            rng.integers(0, 256, (24, 24, 3), dtype=np.uint8),
        )
    return d


def test_inference_cli(img_dir, tmp_path):
    import cv2
    import jax
    import jax.numpy as jnp
    import safetensors.numpy as st

    import trainner_redux_tpu.archs  # noqa: F401
    from trainner_redux_tpu.archs import build_network

    net = build_network({"type": "superultracompact", "scale": 2})
    v = net.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)), train=False)

    def flatten(t, pre=""):
        out = {}
        for k, x in t.items():
            kk = f"{pre}.{k}" if pre else k
            if isinstance(x, dict):
                out.update(flatten(x, kk))
            else:
                out[kk] = np.asarray(x)
        return out

    ckpt = tmp_path / "m.safetensors"
    st.save_file(flatten(v["params"]), str(ckpt))

    out_dir = tmp_path / "out"
    r = _run([
        "scripts/inference.py", "--arch", "superultracompact", "--scale", "2",
        "--model", str(ckpt), "--input", str(img_dir), "--output", str(out_dir),
    ])
    assert r.returncode == 0, r.stderr[-800:]
    outs = sorted(os.listdir(out_dir))
    assert len(outs) == 2
    up = cv2.imread(str(out_dir / outs[0]))
    assert up.shape == (48, 48, 3)


def test_metrics_cli(img_dir):
    r = _run([
        "scripts/metrics/calculate_psnr_ssim.py",
        "--gt", str(img_dir), "--restored", str(img_dir), "--crop_border", "2",
    ])
    assert r.returncode == 0, r.stderr[-800:]
    assert "Average: PSNR: inf" in r.stdout or "Average" in r.stdout


def test_create_lmdb_cli(img_dir, tmp_path):
    env_dir = tmp_path / "d.lmdb"
    r = _run([
        "scripts/data_preparation/create_lmdb.py",
        "--input", str(img_dir), "--output", str(env_dir),
    ])
    assert r.returncode == 0, r.stderr[-800:]
    from trainner_redux_tpu.utils.lmdb_pure import PureLmdbReader

    with PureLmdbReader(str(env_dir)) as rd:
        assert len(rd) == 2


def test_docs_generator(tmp_path):
    r = _run(["scripts/docs/generate_reference_docs.py"])
    assert r.returncode == 0, r.stderr[-800:]
    assert osp.exists(osp.join(REPO, "docs", "source", "architectures.md"))


def test_score_checkpoint_cli(tmp_path):
    """score_checkpoint pipeline smoke: a golden-fixture torch state_dict
    loads through the converters and scores a tiny val pair end-to-end."""
    import cv2

    ckpt = osp.join(REPO, "tests", "golden", "artcnn.safetensors")
    if not osp.exists(ckpt):
        pytest.skip("artcnn golden fixture absent")
    gt_dir = tmp_path / "gt"
    lq_dir = tmp_path / "lq"
    gt_dir.mkdir()
    lq_dir.mkdir()
    rng = np.random.default_rng(0)
    gt = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    cv2.imwrite(str(gt_dir / "a.png"), gt)
    cv2.imwrite(str(lq_dir / "a.png"), gt[::2, ::2])

    r = _run([
        "scripts/parity/score_checkpoint.py", "--arch", "artcnn",
        "--scale", "2", "--checkpoint", ckpt,
        "--gt", str(gt_dir), "--lq", str(lq_dir),
        "--arch-args", '{"filters": 16, "n_block": 2}',
    ])
    assert r.returncode == 0, r.stderr[-800:]
    assert "PSNR" in r.stdout or "psnr" in r.stdout
