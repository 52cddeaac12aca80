"""Generic utilities: flags, run directories, timers."""

from singlehdr_tpu.utils.common import (
    str2bool,
    timestamp,
    create_run_dirs,
    Timer,
)

__all__ = ["str2bool", "timestamp", "create_run_dirs", "Timer"]
