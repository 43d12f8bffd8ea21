"""CLI verb round-trips (reference `lakota/cli.py:650-846`) including
unique-prefix label resolution (`lakota/cli.py:254-277`)."""

import shutil
import tempfile

import pytest

from lakota_spark import cli
from lakota_spark.repo import Repo
from lakota_spark.schema import Schema


@pytest.fixture()
def cli_env(spark, monkeypatch, capsys):
    """A repo pre-seeded via the library + a runner that invokes main()
    with -r pointing at it (sharing the test SparkSession)."""
    root = tempfile.mkdtemp(prefix="lakota-cli-test-")
    repo = Repo(root, spark)
    monkeypatch.setattr(cli, "_repo", lambda args: Repo(args.repo, spark))

    def run(*argv):
        cli.main(["-r", root, *argv])
        return capsys.readouterr().out

    yield root, repo, run
    shutil.rmtree(root, ignore_errors=True)


def _seed(repo):
    coll = repo.create_collection(
        Schema(timestamp="int*", value="float"), "temperature"
    )
    coll.series("paris").write(
        {"timestamp": [1, 2, 3], "value": [1.0, 2.0, 3.0]}
    )
    return coll


def test_prefix_resolution(cli_env):
    root, repo, run = cli_env
    _seed(repo)
    # unique prefixes resolve on both collection and series parts
    assert run("len", "temp/par").strip() == "3"
    assert "value" in run("read", "temp/par")
    # ambiguous/unknown prefixes exit
    repo.create_collection(Schema(timestamp="int*", value="float"), "temp2")
    with pytest.raises(SystemExit):
        run("len", "temp/paris")  # 'temp' now ambiguous
    with pytest.raises(SystemExit):
        run("len", "temperature/nope")


def test_rename_and_clone(cli_env):
    root, repo, run = cli_env
    _seed(repo)
    run("rename", "temperature/paris", "temperature/brussels")
    assert repo.collection("temperature").ls() == ["brussels"]
    run("rename", "temperature", "weather")
    assert "weather" in repo.ls() and "temperature" not in repo.ls()
    run("clone", "weather", "weather2")
    out = Repo(root, repo.spark).collection("weather2").series("brussels")
    assert len(out) == 3


def test_push_pull(cli_env, spark):
    root, repo, run = cli_env
    _seed(repo)
    remote = tempfile.mkdtemp(prefix="lakota-cli-remote-")
    try:
        run("push", remote)
        assert Repo(remote, spark).ls() == ["temperature"]
        # new data flows back via pull
        r2 = Repo(remote, spark)
        r2.collection("temperature").series("nyc").write(
            {"timestamp": [9], "value": [9.0]}
        )
        run("pull", remote)
        assert repo.collection("temperature").ls() == ["nyc", "paris"]
    finally:
        shutil.rmtree(remote, ignore_errors=True)


def test_import_csv_and_trim(cli_env, tmp_path):
    root, repo, run = cli_env
    _seed(repo)
    csv = tmp_path / "more.csv"
    csv.write_text("timestamp,value\n4,4.0\n5,5.0\n")
    run("import", "temperature/paris", str(csv))
    assert run("len", "temperature/paris").strip() == "5"
    run("trim", "temperature")
    coll = Repo(root, repo.spark).collection("temperature")
    assert len(coll.changelog.revisions()) == 1
    assert len(coll.series("paris")) == 5


def test_ls_long(cli_env):
    root, repo, run = cli_env
    _seed(repo)
    out = run("ls", "-l")
    assert "temperature" in out and "1 series" in out
    out = run("ls", "temperature", "-l")
    assert "paris" in out and "3 rows" in out and "1 segs" in out


def test_help_version_length(cli_env):
    root, repo, run = cli_env
    _seed(repo)
    assert "lakota-spark" in run("help")
    assert "--timeout" in run("help", "gc")
    assert run("version").strip()
    # `length` is an alias for `len` (reference verb name)
    assert run("length", "temperature/paris") == run("len", "temperature/paris")
    # Collection supports label iteration (`lakota/collection.py:91`)
    assert list(repo.collection("temperature")) == ["paris"]


def test_read_tail_and_paginate(cli_env):
    root, repo, run = cli_env
    _seed(repo)
    out = run("read", "temperature/paris", "--tail", "2")
    lines = out.strip().splitlines()
    assert lines[0] == "timestamp,value"
    assert [ln.split(",")[0] for ln in lines[1:]] == ["2", "3"]
    out = run("read", "temperature/paris", "--paginate", "2")
    lines = out.strip().splitlines()
    assert lines[0] == "timestamp,value" and len(lines) == 4  # one header


def test_defrag_all_and_metrics(cli_env, capsys):
    root, repo, run = cli_env
    _seed(repo)
    out = run("defrag")          # no labels -> every collection
    assert "defragged temperature" in out
    out = run("trim", "--all")
    assert "trimmed temperature" in out
    # --metrics prints I/O counters to stderr after the verb
    cli.main(["-r", root, "--metrics", "ls"])
    captured = capsys.readouterr()
    assert "FS." in captured.err or "MemFS." in captured.err


def test_cli_maintain(cli_env):
    root, repo, run = cli_env
    _seed(repo)
    out = run("maintain")  # defaults: thresholds not crossed → no-op
    assert "temperature: ok" in out
    out = run("maintain", "--max-revisions", "0")
    assert "temperature: squash" in out
    coll = repo.collection("temperature")
    assert len(coll.changelog.revisions()) == 1
    assert [r.value for r in coll.series("paris").frame().collect()] == [
        1.0, 2.0, 3.0,
    ]


def test_import_export_jsonl_cli(cli_env, tmp_path):
    # jsonl round-trip through the CLI: export a series, import it into
    # a new series, read both back identical
    root, repo, run = cli_env
    from lakota_spark.schema import Schema

    coll = repo.create_collection(Schema(ts="int*", value="float"), "jl")
    coll.series("a").write({"ts": [1, 2, 3], "value": [1.0, 2.0, 3.0]})
    out = str(tmp_path / "jl_export")
    run("export", "jl", out, "--format", "jsonl")
    src = f"{out}/a"
    run("import", "jl/b", src, "--format", "jsonl")
    got_a = sorted(map(tuple, coll.series("a").frame().collect()))
    got_b = sorted(map(tuple, coll.series("b").frame().collect()))
    assert got_a == got_b


def test_web_verb_registered():
    # `lakota-spark web` serves the browse UI (web.py handler) — wiring
    # check only; the endpoints themselves are driven in test_web.py
    from lakota_spark.cli import _build_parser, cmd_web

    p, sub = _build_parser()
    args = p.parse_args(["-r", "/tmp/x", "web", "--port", "0"])
    assert args.fn is cmd_web and args.port == 0


def test_read_mask_pushdown_and_slice_order(cli_env):
    # round 10: a mask WITHOUT limit/offset rides inside frame() (the
    # ordered-scan pushdown path); with a slice it keeps the reference
    # order — slice first, mask after
    root, repo, run = cli_env
    _seed(repo)
    out = run("read", "temperature/paris", "--mask", "(> self.value 1)")
    assert out.splitlines()[1:] == ["2,2.0", "3,3.0"]
    # slice-then-mask: limit 2 keeps rows (1,2); mask > 1 leaves row 2
    out = run("read", "temperature/paris", "--limit", "2",
              "--mask", "(> self.value 1)")
    assert out.splitlines()[1:] == ["2,2.0"]


def test_stats_verb(cli_env):
    root, repo, run = cli_env
    coll = _seed(repo)
    coll.series("paris").write(
        {"timestamp": [4, 5], "value": [4.0, 5.0]}
    )
    out = run("stats")
    line = next(ln for ln in out.splitlines() if "temperature/paris" in ln)
    parts = line.split()
    # segments=2, rows=5, zone maps on both segments
    assert parts[1] == "2" and parts[2] == "5" and parts[-1] == "2"
    # library surface agrees
    (row,) = repo.collection("temperature").stats()
    assert row["segments"] == 2 and row["rows"] == 5
    assert row["zone_maps"] == 2 and row["clipped"] == 0


def test_compact_verb(cli_env):
    """`compact <collection>/<series>` (round 13): overlapping KV
    layout -> one full-span segment, same reads; non-KV refuses with a
    defrag pointer."""
    root, repo, run = cli_env
    coll = repo.create_collection(
        Schema.kv_schema(k="int*", v="int"), "registry"
    )
    s = coll.series("ids")
    s.write({"k": [1, 2], "v": [10, 20]})
    s.write({"k": [2, 3], "v": [21, 30]})
    out = run("compact", "reg/ids")  # unique-prefix resolution
    assert "compacted" in out
    assert len(coll.snapshot().for_label("ids")) == 1
    assert sorted(
        (r.k, r.v) for r in s.frame().collect()
    ) == [(1, 10), (2, 21), (3, 30)]
    _seed(repo)
    with pytest.raises(SystemExit, match="not a KV series"):
        run("compact", "temperature/paris")
