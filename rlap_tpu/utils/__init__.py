from rlap_tpu.utils.logging import (MetricsLogger, read_metrics,  # noqa: F401
                                    aggregate, results_table)
from rlap_tpu.utils.config import ExperimentConfig, sweep  # noqa: F401
from rlap_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint  # noqa: F401
from rlap_tpu.utils.compile_cache import setup_compilation_cache  # noqa: F401
from rlap_tpu.utils.tracing import TRACER, Timer, annotate, trace  # noqa: F401
