from rlap_tpu.eval.split import get_split  # noqa: F401
from rlap_tpu.eval.linear_probe import lr_evaluate  # noqa: F401
from rlap_tpu.eval.metrics import accuracy, f1_micro, f1_macro  # noqa: F401
