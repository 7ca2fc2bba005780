"""Random index splits (PyGCL `get_split` parity: train_ratio/test_ratio,
remainder = validation; reference uses 0.1/0.8 for node tasks
(`node_shared.py:286`) and 0.8/0.1 for graph tasks (`graph_shared.py:188`)).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def get_split(num_samples: int, train_ratio: float = 0.1,
              test_ratio: float = 0.8, seed: int = 0) -> Dict[str, np.ndarray]:
    assert train_ratio + test_ratio < 1
    train_size = int(num_samples * train_ratio)
    test_size = int(num_samples * test_ratio)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(num_samples)
    return {
        "train": perm[:train_size],
        "test": perm[train_size:train_size + test_size],
        "valid": perm[train_size + test_size:],
    }
