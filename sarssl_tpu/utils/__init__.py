from .seeding import set_seed, epoch_key
from .logging import MetricLogger, save_config
from .metrics import count_params, detect_nonfinite

__all__ = ["set_seed", "epoch_key", "MetricLogger", "save_config",
           "count_params", "detect_nonfinite"]
