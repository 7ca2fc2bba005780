"""Experiment configuration + grid sweeps.

Replaces the reference's hardcoded shell-array grids
(`run_node_shared.sh:4-12`: 15 augmentors x datasets x layers(2,4,8) x
lr(1e-2..1e-4) x dims(128,256,512) x fractions) with a declarative config
object and an iterator that yields every grid point, with
skip-if-done resumability at result-file granularity
(`run_node_shared.sh:29-31` semantics).
"""

from __future__ import annotations

import dataclasses
import itertools
import json
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Sequence


@dataclasses.dataclass
class ExperimentConfig:
    recipe: str = "grace"  # grace | mvgrl | graphcl | bgrl | cca_ssg
    dataset: str = "CORA"
    augmentor: str = "rLap"
    num_layers: int = 2
    lr: float = 1e-3
    weight_decay: float = 1e-5
    hidden_dim: int = 128
    fraction1: float = 0.2
    fraction2: float = 0.2
    max_epochs: int = 2000
    tolerance: int = 50
    seed: int = 0
    # CCA-SSG extras
    lam: float = 1e-3
    feat_drop_rate: float = 0.2

    def run_name(self) -> str:
        return (f"{self.recipe}_{self.dataset}_{self.augmentor}"
                f"_L{self.num_layers}_lr{self.lr}_wd{self.weight_decay}"
                f"_h{self.hidden_dim}_f{self.fraction1}-{self.fraction2}"
                f"_s{self.seed}")

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @staticmethod
    def from_json(s: str) -> "ExperimentConfig":
        return ExperimentConfig(**json.loads(s))


def sweep(base: Optional[ExperimentConfig] = None,
          results_dir: Optional[str] = None,
          **grid: Sequence) -> Iterator[ExperimentConfig]:
    """Yield configs over the cartesian product of `grid` fields, skipping
    points whose result file already exists (resumable sweeps)."""
    base = base or ExperimentConfig()
    keys = list(grid)
    for values in itertools.product(*(grid[k] for k in keys)):
        cfg = dataclasses.replace(base, **dict(zip(keys, values)))
        if results_dir is not None:
            out = Path(results_dir) / f"{cfg.run_name()}.jsonl"
            if out.exists():
                continue
        yield cfg
