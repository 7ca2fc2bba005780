"""The one-command real-data parity runner (tools/run_parity.py), dry-run
against format-faithful miniatures: discovery, provenance manifest,
training through the real-format loaders, and the synthetic=False report.
"""

import json
import sys
from pathlib import Path

import pytest

TOOLS = Path(__file__).resolve().parent.parent / "tools"
sys.path.insert(0, str(TOOLS))


def test_dry_parity_pipeline(tmp_path):
    import run_parity as rp

    root = tmp_path / "data"
    rp.write_planetoid_miniature(root, "Cora", n=192, classes=3, fdim=8)

    found = rp.discover(root)
    assert ("node", "CORA") in found

    results = tmp_path / "out"
    rc = rp.run(root, results, {"CORA"}, ["rLap"], [0],
                eval_repeats=1, max_epochs=2, hidden_dim=16)
    assert rc == 0

    manifest = json.loads((results / "MANIFEST.json").read_text())
    files = manifest["datasets"]["CORA"]["files"]
    assert any("ind.cora.graph" in k for k in files)
    assert all(len(v) == 64 for v in files.values())  # sha256 hex

    md = (results / "RESULTS.md").read_text()
    assert "synthetic=False" in md
    runs = list(results.glob("*.jsonl"))
    assert len(runs) == 2  # grace + cca_ssg
    for p in runs:
        recs = [json.loads(x) for x in p.read_text().splitlines()]
        ds = [r for r in recs if r.get("event") == "dataset"]
        assert ds and ds[0]["synthetic"] is False
        assert any(r.get("event") == "test_run" for r in recs)


def test_tu_miniature_roundtrip(tmp_path):
    import run_parity as rp

    from rlap_tpu.data.loaders import load_graph_dataset

    rp.write_tu_miniature(tmp_path, "MUTAG", num_graphs=12)
    graphs, y, meta = load_graph_dataset("MUTAG", root=str(tmp_path))
    assert meta["synthetic"] is False
    assert len(graphs) == 12 and len(y) == 12
    assert set(y.tolist()) == {0, 1}
