"""S14 incremental aggregation: files landing in a directory merge
into the running summary via Structured Streaming (checkpointed =
-tmp_save analog, miw/job.cc:197-226, miw/mr_job.h:147-177).
"""

from __future__ import annotations

import time

from cybersecurity_miw_spark.plans.logdef import LogDef
from cybersecurity_miw_spark.streaming.merge import stream_logs

FMT = {
    "format_name": "st",
    "delims": ",",
    "fields": [
        {"name": "etype", "pos": 1, "type": "string", "key": True},
        {"name": "val", "pos": 2, "type": "int",
         "aggregated": True, "aggregation": "sum"},
    ],
}


def _run_stream(spark, indir, ckpt, outdir):
    q = stream_logs(
        spark, indir, LogDef.from_json(FMT), ckpt, outdir, available_now=True
    )
    q.awaitTermination(120)
    time.sleep(0.2)


def test_incremental_file_merge(spark, tmp_path):
    indir = tmp_path / "in"
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    indir.mkdir()

    (indir / "a.log").write_text("1,x,10\n2,x,5\n3,y,1\n")
    _run_stream(spark, str(indir), ckpt, outdir)
    first = {
        r["etype"]: (r["logs"], r["val"])
        for r in spark.read.parquet(outdir).collect()
    }
    assert first == {"x": (2, 15), "y": (1, 1)}

    # a new file lands; resuming from the checkpoint folds ONLY the new
    # data into the existing state (the reference's re-emit machinery)
    (indir / "b.log").write_text("4,x,7\n5,z,2\n")
    _run_stream(spark, str(indir), ckpt, outdir)
    second = {
        r["etype"]: (r["logs"], r["val"])
        for r in spark.read.parquet(outdir).collect()
    }
    assert second == {"x": (3, 22), "y": (1, 1), "z": (1, 2)}


def test_crash_mid_batch_resumes_exactly_once(spark, tmp_path):
    """SURVEY §2.9 exactly-once emit: kill the query AFTER the batch's
    side effect but BEFORE its offsets commit; the restart replays the
    batch idempotently (overwrite snapshot) — counts are exact, never
    doubled."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    indir = tmp_path / "in"
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    indir.mkdir()

    (indir / "a.log").write_text("1,x,10\n2,x,5\n3,y,1\n")
    _run_stream(spark, str(indir), ckpt, outdir)

    # new chunk lands; this run CRASHES after writing the snapshot but
    # before the offset commit (the kill-after-batch-1 scenario)
    (indir / "b.log").write_text("4,x,7\n5,z,2\n")

    def crashing_write(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(outdir)
        raise RuntimeError("simulated crash before offset commit")

    from cybersecurity_miw_spark.plans.logdef import LogDef
    from cybersecurity_miw_spark.streaming.merge import stream_logs

    q = stream_logs(
        spark, str(indir), LogDef.from_json(FMT), ckpt, outdir,
        available_now=True, write_batch=crashing_write,
    )
    try:
        q.awaitTermination(120)
    except StreamingQueryException:
        pass
    assert not q.isActive

    # resume: the uncommitted batch replays; totals are exactly-once
    _run_stream(spark, str(indir), ckpt, outdir)
    final = {
        r["etype"]: (r["logs"], r["val"])
        for r in spark.read.parquet(outdir).collect()
    }
    assert final == {"x": (3, 22), "y": (1, 1), "z": (1, 2)}
