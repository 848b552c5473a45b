from trainner_redux_tpu.utils.logger import AvgTimer, MessageLogger, get_env_info, get_root_logger
from trainner_redux_tpu.utils.misc import (
    check_resume,
    get_time_str,
    make_exp_dirs,
    mkdir_and_rename,
    scandir,
    set_random_seed,
    sizeof_fmt,
)
from trainner_redux_tpu.utils.registry import (
    ARCH_REGISTRY,
    DATASET_REGISTRY,
    LOSS_REGISTRY,
    METRIC_REGISTRY,
    MODEL_REGISTRY,
    OPTIMIZER_REGISTRY,
    SPANDREL_REGISTRY,
    TESTARCH_REGISTRY,
)
from trainner_redux_tpu.utils.rng import RNG
