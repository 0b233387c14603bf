"""The spark-submit application shell (tools/run_pipeline.py): rules
load from a directory tree, the CLI arg surface maps onto the tested
StreamingRuleEngine, restart resumes from checkpoint without
duplicates, and the packaged ``spark-submit --py-files`` invocation —
the north rule's deployment shape — actually runs end to end."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

import pytest
from pyspark.sql import functions as F

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
sys.path.insert(0, TOOLS)

import run_pipeline  # noqa: E402

RULES = """
Role: str = JsonData(path='$.role')
TurnText: str = JsonData(path='$.text')
IsAssistant = Role == 'assistant'
Greets = 'hello' in StringToLower(s=TurnText)
GreetRule = Rule(when_all=[IsAssistant, Greets], description='assistant greeting')
WhenRules(rules_any=[GreetRule], then=[DeclareVerdict(verdict='flag')])
"""


@pytest.fixture(scope="module")
def rules_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rules")
    (d / "main.sml").write_text("Import(rules=['lib/greet.sml'])\n")
    (d / "lib").mkdir()
    (d / "lib" / "greet.sml").write_text(RULES)
    return str(d)


@pytest.fixture(scope="module")
def input_dir(spark, tmp_path_factory):
    from osprey_spark.turns import generate_turns

    d = str(tmp_path_factory.mktemp("pipe_in"))
    generate_turns(spark, n_convs=30, turns_per_conv=8, hot_convs=0).repartition(3).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def _args(rules_dir, input_dir, out, **over):
    base = ["--rules", rules_dir, "--input", input_dir, "--output", out]
    for k, v in over.items():
        flag = "--" + k.replace("_", "-")
        if v is True:
            base.append(flag)
        else:
            base += [flag, str(v)]
    return run_pipeline.build_parser().parse_args(base)


def test_load_rules_tree(rules_dir):
    src = run_pipeline.load_rules(rules_dir)
    assert set(src) == {"main.sml", os.path.join("lib", "greet.sml")}
    with pytest.raises(SystemExit):
        run_pipeline.load_rules(os.path.dirname(rules_dir) + "/nope")


def test_cli_runs_and_matches_batch(spark, rules_dir, input_dir, tmp_path):
    out = str(tmp_path / "out")
    metrics = str(tmp_path / "metrics.jsonl")
    q = run_pipeline.run(
        _args(rules_dir, input_dir, out, metrics=metrics, buckets=4, shuffle_partitions=4),
        spark=spark,
    )
    q.awaitTermination()

    got = spark.read.parquet(os.path.join(out, "data"))
    src = spark.read.parquet(input_dir)
    assert got.count() == src.count()
    # feature parity vs a direct batch apply of the same rule tree
    from osprey_spark.compiler import compile_ruleset
    from osprey_spark.turns import TURN_BINDINGS, with_envelope

    rs = compile_ruleset(run_pipeline.load_rules(rules_dir), bindings=TURN_BINDINGS)
    exp = rs.apply(with_envelope(src), passthrough=["conv_id", "turn_idx", "ts"])
    a = got.select("conv_id", "turn_idx", "IsAssistant", "Greets").orderBy(
        "conv_id", "turn_idx"
    )
    b = exp.select("conv_id", "turn_idx", "IsAssistant", "Greets").orderBy(
        "conv_id", "turn_idx"
    )
    assert a.collect() == b.collect()
    # metrics listener appended progress lines
    lines = [json.loads(x) for x in open(metrics)]
    assert any(r.get("event") == "progress" and r.get("num_input_rows") for r in lines)


def test_cli_restart_resumes_without_duplicates(spark, rules_dir, input_dir, tmp_path):
    out = str(tmp_path / "out2")
    args = _args(rules_dir, input_dir, out, buckets=4)
    run_pipeline.run(args, spark=spark).awaitTermination()
    n1 = spark.read.parquet(os.path.join(out, "data")).count()
    # restart on the same checkpoint: drained source -> no new rows
    run_pipeline.run(args, spark=spark).awaitTermination()
    assert spark.read.parquet(os.path.join(out, "data")).count() == n1
    # append a new file, restart again: only the delta lands
    extra = (
        spark.read.parquet(input_dir)
        .filter((F.col("turn_idx") == 0) & (F.col("conv_id") < "conv_00000005"))
        .dropDuplicates(["conv_id"])
    )
    n_extra = extra.count()
    extra.coalesce(1).write.mode("append").parquet(input_dir)
    run_pipeline.run(args, spark=spark).awaitTermination()
    assert spark.read.parquet(os.path.join(out, "data")).count() == n1 + n_extra


STATEFUL_RULES = """
K: str = JsonData(path='$.conv_id')
IsUser = JsonData(path='$.role') == 'user'
N = IncrementWindow(key=K, window_seconds=600.0, when_all=[IsUser])
Bursty = N >= 3
"""


def test_cli_stateful_rule_state_survives_restart(spark, tmp_path):
    """The app shell drives the state-op path: an IncrementWindow rule
    through run_pipeline, with the second half of the stream arriving
    after a restart — counter state restores from the checkpoint, so
    the final counts equal one batch evaluation of the whole input."""
    from osprey_spark.compiler import compile_ruleset
    from osprey_spark.turns import TURN_BINDINGS, generate_turns, with_envelope

    rdir = tmp_path / "rules"
    rdir.mkdir()
    (rdir / "main.sml").write_text(STATEFUL_RULES)
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    t = generate_turns(spark, n_convs=12, turns_per_conv=8, hot_convs=0).cache()
    t.filter(F.col("turn_idx") < 4).coalesce(1).write.mode("append").parquet(in_dir)

    args = _args(str(rdir), in_dir, out, buckets=2)
    run_pipeline.run(args, spark=spark).awaitTermination()
    t.filter(F.col("turn_idx") >= 4).coalesce(1).write.mode("append").parquet(in_dir)
    run_pipeline.run(args, spark=spark).awaitTermination()

    got = (
        spark.read.parquet(os.path.join(out, "data"))
        .select("conv_id", "turn_idx", F.col("N").cast("long").alias("n"), "Bursty")
    )
    rs = compile_ruleset({"main.sml": STATEFUL_RULES}, bindings=TURN_BINDINGS)
    exp = rs.apply(with_envelope(t), passthrough=["conv_id", "turn_idx", "ts"]).select(
        "conv_id", "turn_idx", F.col("N").cast("long").alias("n"), "Bursty"
    )
    assert got.count() == t.count()
    key = ["conv_id", "turn_idx"]
    assert got.orderBy(*key).collect() == exp.orderBy(*key).collect()
    t.unpersist()


def test_cli_explain_prints_plan_without_starting(spark, rules_dir, input_dir, tmp_path, capsys):
    out = str(tmp_path / "noout")
    q = run_pipeline.run(
        _args(rules_dir, input_dir, out, explain=True), spark=spark
    )
    assert q is None
    plan = capsys.readouterr().out
    assert "Physical Plan" in plan
    assert not os.path.exists(os.path.join(out, "data"))  # nothing ran


def test_spark_submit_py_files_end_to_end(rules_dir, input_dir, tmp_path):
    """The real deployment invocation: a fresh JVM via spark-submit with
    the library shipped as --py-files, nothing importable from CWD."""
    repo = os.path.dirname(TOOLS)
    zpath = str(tmp_path / "osprey_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(repo, "osprey_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))
    out = str(tmp_path / "out_submit")
    r = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--conf",
            "spark.sql.session.timeZone=UTC",
            "--py-files",
            zpath,
            os.path.join(TOOLS, "run_pipeline.py"),
            "--rules",
            rules_dir,
            "--input",
            input_dir,
            "--output",
            out,
            "--buckets",
            "2",
            "--shuffle-partitions",
            "4",
        ],
        cwd=str(tmp_path),  # NOT the repo root: --py-files must supply the package
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    assert os.path.isdir(os.path.join(out, "data"))
    assert os.path.isdir(os.path.join(out, "_commits"))
