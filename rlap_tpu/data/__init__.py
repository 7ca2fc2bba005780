from rlap_tpu.data.synthetic import barabasi_albert, sbm, synthetic_node_dataset  # noqa: F401
