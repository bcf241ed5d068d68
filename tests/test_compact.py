"""Golden for the simple_log_compacter equivalent
(app/simple_log_compacter.cc → operators/compact.py): duplicate lines
across multiple files collapse to one survivor each; counts mode
reports raw occurrences."""

from __future__ import annotations

from cybersecurity_miw_spark.operators.compact import (
    compact_lines,
    compact_logs,
)


def write_logs(tmp_path):
    a = tmp_path / "a.log"
    b = tmp_path / "b.log"
    a.write_text("alpha\nbeta\nalpha\ngamma\n")
    b.write_text("beta\ndelta\nalpha\n")
    return [str(a), str(b)]


def test_compact_collapses_duplicates_across_files(spark, tmp_path):
    paths = write_logs(tmp_path)
    out = compact_logs(spark, paths)
    lines = sorted(r.value for r in out.collect())
    assert lines == ["alpha", "beta", "delta", "gamma"]


def test_compact_with_counts(spark, tmp_path):
    paths = write_logs(tmp_path)
    out = compact_logs(spark, ",".join(paths), with_counts=True)
    got = {r.value: r.occurrences for r in out.collect()}
    assert got == {"alpha": 3, "beta": 2, "gamma": 1, "delta": 1}


def test_compact_lines_is_single_shuffle(spark, tmp_path):
    paths = write_logs(tmp_path)
    df = compact_lines(spark.read.text(paths))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_compact_cli_mode(spark, tmp_path, monkeypatch, capsys):
    """-compact runs the simple_log_compacter workflow through the
    same CLI entry point as the reference binary."""
    from cybersecurity_miw_spark import job as job_mod

    paths = write_logs(tmp_path)
    outdir = str(tmp_path / "out")
    # reuse the session-scoped spark: the CLI's get_spark resolves to
    # the same underlying session via getOrCreate
    job_mod.main(
        ["-fnames", ",".join(paths), "-compact", "-ofname", outdir]
    )
    got = sorted(
        line
        for p in (tmp_path / "out").glob("part-*")
        for line in p.read_text().splitlines()
    )
    assert got == ["alpha", "beta", "delta", "gamma"]
