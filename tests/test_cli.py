"""CLI + registry contract tests (no Spark session needed for list/oracle)."""

from __future__ import annotations

import subprocess
import sys

import pytest


def _run(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "hadoop_web_browsing_logs_spark", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )


def test_cli_list():
    r = _run("list")
    assert r.returncode == 0
    assert "q1_pricing_summary" in r.stdout
    assert "q_ref_pipeline" in r.stdout
    assert "[text/rows-only]" in r.stdout


def test_cli_oracle():
    r = _run("oracle", "q1_pricing_summary")
    assert r.returncode == 0
    assert "FROM lineitem" in r.stdout


def test_cli_oracle_rows_only_query():
    r = _run("oracle", "q_ref_pipeline")
    assert r.returncode == 1
    assert "rows-only" in r.stderr


def test_cli_unknown_query():
    r = _run("run", "q_no_such_query")
    assert r.returncode == 2
    assert "unknown query" in r.stderr


def test_registry_rejects_duplicate_names():
    from hadoop_web_browsing_logs_spark.plans.registry import all_queries, query

    all_queries()  # force operator-module registration first
    with pytest.raises(ValueError, match="duplicate query name"):

        @query("q1_pricing_summary")
        def dup(spark, sf_dir):  # pragma: no cover
            raise AssertionError


def test_corpus_reader_skips_non_numeric_filenames(spark, tmp_path):
    (tmp_path / "1.txt").write_text("alpha")
    (tmp_path / "README.txt").write_text("should be skipped")
    from hadoop_web_browsing_logs_spark.sources.readers import read_corpus_dir

    rows = {r.doc_id for r in read_corpus_dir(spark, str(tmp_path)).collect()}
    assert rows == {1}
