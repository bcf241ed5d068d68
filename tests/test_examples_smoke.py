"""Smoke tests for the showcase examples — the
training_data_pipeline precedent extended to the other three: each
example's ``main()`` must run end to end against the test tables (or
its own synthesized inputs) without raising. Cheap insurance that
the documented entry points keep working as the operators under
them evolve; deeper semantics are covered by the operator suites."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)))
)


def test_security_analytics_example(spark, sf_dir, capsys):
    import examples.security_analytics as ex

    ex.main(sf_dir)
    out = capsys.readouterr().out
    assert out.strip()  # the demo narrates its result tables


def test_ann_index_pipeline_example(spark, sf_dir, capsys):
    import examples.ann_index_pipeline as ex

    ex.main(sf_dir)
    assert capsys.readouterr().out.strip()


def test_crawl_pipeline_example(spark, capsys):
    # self-contained: synthesizes its own WARC mini-web; the builder
    # inside main() getOrCreate()s onto the test session
    import examples.crawl_pipeline as ex

    ex.main()
    out = capsys.readouterr().out
    assert "fetched pages" in out
    assert "next fetch list" in out
