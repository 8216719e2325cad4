"""docs/QUICKSTART.md smoke test (VERDICT r11 item 8): every fenced
``python`` block in the quickstart executes verbatim against a live
session — the documented examples ARE the test, so they cannot rot.
Each block is self-contained given ``spark`` (its own imports, its own
tiny DataFrames, its own assertions)."""

from __future__ import annotations

import re
from pathlib import Path

import pytest

QUICKSTART = Path(__file__).resolve().parent.parent / "docs" / "QUICKSTART.md"


def _blocks() -> list[tuple[int, str]]:
    text = QUICKSTART.read_text()
    out = []
    for m in re.finditer(r"```python\n(.*?)```", text, re.DOTALL):
        line = text[: m.start()].count("\n") + 2
        out.append((line, m.group(1)))
    return out


def test_quickstart_has_example_per_generic():
    text = QUICKSTART.read_text()
    blocks = _blocks()
    assert len(blocks) >= 9
    for generic in (
        "pagerank",
        "label_propagation",
        "bfs_frontier",
        "lloyd_kmeans",
        "semantic_dedup",
        "dedup_exact",
        "minhash_lsh_pairs",
        "jaccard_prefix_pairs",
        "connected_components",
        "fuzzy_vocab_pairs",
        "brute_force_topk",
    ):
        assert any(generic in b for _, b in blocks), generic
        assert generic in text


@pytest.mark.parametrize("line,code", _blocks(), ids=lambda v: str(v)[:60])
def test_quickstart_block_runs(spark, line, code):
    ns = {"spark": spark}
    try:
        exec(compile(code, f"docs/QUICKSTART.md:{line}", "exec"), ns)
    except AssertionError as e:  # pragma: no cover - diagnostic clarity
        raise AssertionError(f"QUICKSTART.md block at line {line} failed: {e}") from e
