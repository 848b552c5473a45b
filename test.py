"""Inference/eval entry point (parity: /root/reference/test.py:19-80)."""

from __future__ import annotations

import logging
import os
import sys
from os import path as osp

if os.environ.get("TRAINNER_PLATFORM"):
    os.environ["JAX_PLATFORMS"] = os.environ["TRAINNER_PLATFORM"]
    import jax

    jax.config.update("jax_platforms", os.environ["TRAINNER_PLATFORM"])


def test_pipeline(root_path: str, argv: list[str] | None = None) -> None:
    from trainner_redux_tpu.data import build_dataloader, build_dataset
    from trainner_redux_tpu.models import build_model
    from trainner_redux_tpu.utils import get_env_info, get_root_logger, make_exp_dirs
    from trainner_redux_tpu.utils.config import Config
    from trainner_redux_tpu.utils.options import dict2str

    opt, _args = Config.load_config_from_file(root_path, is_train=False, argv=argv)
    make_exp_dirs(opt)
    log_file = osp.join(opt.path.log or ".", f"test_{opt.name}.log")
    logger = get_root_logger(log_level=logging.INFO, log_file=log_file)
    logger.info(get_env_info())
    logger.info(dict2str(opt))

    test_loaders = []
    for _phase, dataset_opt in sorted(opt.datasets.items()):
        test_set = build_dataset(dataset_opt)
        test_loaders.append(build_dataloader(test_set, dataset_opt, num_gpu=1))
        logger.info(f"Number of test images in {dataset_opt.name}: {len(test_set)}")

    model = build_model(opt)
    for test_loader in test_loaders:
        test_set_name = test_loader.dataset.opt.name
        logger.info(f"Testing {test_set_name}...")
        model.validation(
            test_loader,
            current_iter=opt.name,
            tb_logger=None,
            save_img=bool(opt.val.save_img if opt.val else True),
        )


if __name__ == "__main__":
    test_pipeline(osp.abspath(osp.dirname(__file__)), sys.argv[1:])
