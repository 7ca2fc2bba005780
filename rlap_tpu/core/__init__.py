from rlap_tpu.core.graph import Graph  # noqa: F401
