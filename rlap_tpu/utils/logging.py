"""Structured metrics logging.

The reference uses stdout-as-database: printed lines in a fixed grammar
scraped back with grok patterns (`prepare_final_stats.py:23`,
`process_results.py:21`). Here runs append JSONL records
(one object per event) and the aggregation utilities consume those directly
— same capability, no fragile text parsing.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path
from typing import Any, Dict, Iterator, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, run_id: str = "",
                 echo: bool = True, **context):
        self.path = Path(path) if path else None
        self.run_id = run_id or f"run-{int(time.time())}"
        self.context = context
        self.echo = echo
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, event: str, **fields):
        rec: Dict[str, Any] = {"ts": time.time(), "run_id": self.run_id,
                               "event": event, **self.context, **fields}
        line = json.dumps(rec, default=float)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")
        if self.echo:
            print(line, file=sys.stderr, flush=True)
        return rec

    def metric(self, name: str, value, step: Optional[int] = None, **fields):
        return self.log("metric", name=name, value=float(value), step=step,
                        **fields)


def read_metrics(path: str, event: Optional[str] = None) -> Iterator[dict]:
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                # a run killed mid-write leaves one truncated final line;
                # skip it rather than lose the whole file's rows
                continue
            if event is None or rec.get("event") == event:
                yield rec


def aggregate(paths, name: str):
    """mean ± std of a metric across runs — the reference's
    `prepare_final_stats.py` tables, minus the log scraping."""
    import numpy as np

    vals = []
    for p in paths:
        for rec in read_metrics(p, "metric"):
            if rec.get("name") == name:
                vals.append(rec["value"])
    arr = np.asarray(vals, float)
    return {"mean": float(arr.mean()) if arr.size else float("nan"),
            "std": float(arr.std()) if arr.size else float("nan"),
            "n": int(arr.size)}


def results_table(paths, metric: str = "accuracy",
                  row_key: str = "augmentor", col_key: str = "dataset",
                  fmt: str = "markdown") -> str:
    """Pivot `test_run` records into a mean±std table, markdown or LaTeX —
    the reference's pandas `to_latex`/`to_markdown` emitters
    (`prepare_final_stats.py:58-72`, `process_results.py:37-49`)."""
    import numpy as np

    cells: Dict[tuple, list] = {}
    for p in paths:
        for rec in read_metrics(p, "test_run"):
            if metric in rec:
                cells.setdefault((str(rec.get(row_key)),
                                  str(rec.get(col_key))), []).append(
                    float(rec[metric]))
    rows = sorted({k[0] for k in cells})
    cols = sorted({k[1] for k in cells})

    def cell(r, c):
        v = cells.get((r, c))
        if not v:
            return "-"
        a = np.asarray(v)
        if a.size == 1:
            # never print a ±std on a single sample (it reads as a sweep)
            return f"{a[0]:.4f} (n=1)"
        return f"{a.mean():.4f}±{a.std():.4f} (n={a.size})"

    if fmt == "latex":
        lines = ["\\begin{tabular}{l" + "c" * len(cols) + "}",
                 " & ".join([row_key] + cols) + " \\\\ \\hline"]
        for r in rows:
            lines.append(" & ".join([r] + [cell(r, c) for c in cols])
                         + " \\\\")
        lines.append("\\end{tabular}")
        return "\n".join(lines)
    header = "| " + " | ".join([row_key] + cols) + " |"
    sep = "|" + "|".join(["---"] * (len(cols) + 1)) + "|"
    body = ["| " + " | ".join([r] + [cell(r, c) for c in cols]) + " |"
            for r in rows]
    return "\n".join([header, sep] + body)
