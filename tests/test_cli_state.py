"""Tests for the CLI entry points and lineage/state utilities."""

from __future__ import annotations

import json

import pytest

from pyjelly_ray.cli import main as cli_main
from pyjelly_ray.pipelines.corpus import write_corpus_parquet
from pyjelly_ray.state.manifest import (
    load_manifests,
    pending_shards,
    summarize,
    validate_invariants,
)


@pytest.fixture(scope="module")
def kg_out(ray_session, tmp_path_factory):
    from pyjelly_ray.pipelines.kg import build_kg

    d = tmp_path_factory.mktemp("clistate")
    corpus = str(d / "corpus.parquet")
    write_corpus_parquet(corpus, seed=11, n_files=120)
    out = str(d / "kg")
    build_kg(corpus, out, n_shards=4).materialize()
    return out


def test_manifest_load_and_summary(kg_out):
    manifests = load_manifests(kg_out)
    assert manifests and all(m["status"] == "written" for m in manifests)
    s = summarize(kg_out)
    assert s["n_shards"] == len(manifests)
    assert s["n_statements"] == sum(m["n_statements"] for m in manifests)


def test_validate_invariants_decode(kg_out):
    result = validate_invariants(kg_out, decode=True)
    assert result["ok"], result["problems"]


def test_pending_shards(kg_out):
    manifests = load_manifests(kg_out)
    expected = {m["shard"]: m["sha256_xor"] for m in manifests}
    assert pending_shards(kg_out, expected) == []
    # corrupt one fingerprint → that shard becomes pending
    victim = manifests[0]["shard"]
    expected[victim] = "0" * 64
    assert pending_shards(kg_out, expected) == [victim]


def test_cli_validate_and_roundtrip(kg_out, capsys):
    assert cli_main(["validate", "--out", kg_out, "--decode"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"]

    manifests = load_manifests(kg_out)
    assert cli_main(["roundtrip", "--jelly", manifests[0]["path"]]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["stable"] and out["statements"] == manifests[0]["n_statements"]


def test_cli_gen_corpus(tmp_path, capsys):
    p = str(tmp_path / "c.parquet")
    assert cli_main(["gen-corpus", "--out", p, "--files", "50"]) == 0
    import pyarrow.parquet as pq

    t = pq.read_table(p)
    assert t.num_rows == 50
    assert t.schema.names == ["repo", "path", "commit", "lang", "content"]


def test_cli_pagerank(tmp_path, capsys, ray_session):
    import json

    p = str(tmp_path / "prc.parquet")
    assert cli_main(["gen-corpus", "--out", p, "--files", "120"]) == 0
    capsys.readouterr()
    assert cli_main(["pagerank", "--corpus", p, "--iters", "3", "--top", "5"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["top"]) == 5
    ranks = [r["rank"] for r in out["top"]]
    assert ranks == sorted(ranks, reverse=True) and ranks[0] > 0


def test_cli_quality(ray_session):
    """`quality` subcommand: JSON report, exit 0 on all-pass, 2 on fail."""
    import json
    import subprocess
    import sys

    def run(rules):
        return subprocess.run(
            [sys.executable, "-m", "pyjelly_ray.cli", "quality",
             "--sf-dir", "/root/testdata/sf0.001", "--table", "orders",
             "--rules", json.dumps(rules)],
            capture_output=True, text=True, cwd="/root/repo",
        )

    ok = run([{"rule": "k", "column": "o_orderkey", "kind": "unique"}])
    assert ok.returncode == 0
    rep = json.loads(ok.stdout.strip().splitlines()[-1])
    assert rep["all_passed"] and rep["rules"][0]["n_violations"] == 0

    bad = run([{"rule": "r", "column": "o_totalprice", "kind": "in_range",
                "lo": 0, "hi": 100}])
    assert bad.returncode == 2
    rep = json.loads(bad.stdout.strip().splitlines()[-1])
    assert not rep["all_passed"] and rep["rules"][0]["n_violations"] > 0
