"""Config layer: INI use-case parsing (reference format) + end-to-end
run_all tick into an OutlierStore."""

import datetime as dt
import textwrap

from ee_outliers_spark.config import (
    AnalyzerSpec, load_use_cases, parse_duration, run_all, run_analyzer,
)
from ee_outliers_spark.sources.results import OutlierStore

INI = """
[simplequery_powershell_hidden]
es_query_filter=powershell AND "hidden window"
outlier_type=powershell
outlier_reason=hidden powershell window
outlier_summary=hidden powershell on {host}
run_model=1

[terms_rare_host_process]
es_query_filter=_exists_:host
aggregator=proc
target=host
target_count_method=across_aggregators
trigger_on=low
trigger_method=float
trigger_sensitivity=2
outlier_summary=rare process {proc}
run_model=1

[metrics_long_cmdline]
aggregator=host
target=text
metric=length
trigger_on=high
trigger_method=float
trigger_sensitivity=30
run_model=0

[not_an_analyzer]
foo=bar
"""


def test_parse_use_cases(tmp_path):
    p = tmp_path / "cases.conf"
    p.write_text(textwrap.dedent(INI))
    specs = load_use_cases(str(p))
    assert [s.name for s in specs] == [
        "simplequery_powershell_hidden", "terms_rare_host_process",
        "metrics_long_cmdline",
    ]
    sq, tm, mt = specs
    assert sq.model_type == "simplequery"
    assert tm.aggregator == ["proc"] and tm.trigger_sensitivity == 2.0
    assert mt.run_model is False
    assert parse_duration("001:12:30") == dt.timedelta(days=1, hours=12, minutes=30)


def _events(spark):
    rows = [
        (1, "powershell -W hidden window run", "hostA", "pwsh"),
        (2, "powershell plain", "hostA", "pwsh"),
        (3, "explorer stuff", "hostB", "explorer"),
        (4, "svc beacon", "hostB", "rare.exe"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, host string, proc string")


def test_run_analyzer_simplequery_render(spark):
    spec = AnalyzerSpec(
        name="simplequery_x", model_type="simplequery",
        es_query_filter='powershell AND "hidden window"',
        outlier_summary="hidden powershell on {host}",
    )
    out = run_analyzer(_events(spark), spec)
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["outlier_summary"] == "hidden powershell on hostA"
    assert rows[0]["model_name"] == "simplequery_x"


def test_run_all_into_store(spark, tmp_path):
    p = tmp_path / "cases.conf"
    p.write_text(textwrap.dedent(INI))
    specs = load_use_cases(str(p))
    store = OutlierStore(spark, str(tmp_path / "outliers.parquet"))
    counts = run_all(_events(spark), specs, store=store)
    assert counts["simplequery_powershell_hidden"] == 1
    assert "metrics_long_cmdline" not in counts  # run_model=0
    # terms across: each proc has 1 distinct host; frontier 'float' 2 low
    # flags every aggregator (1 < 2) -> all 4 docs
    assert counts["terms_rare_host_process"] == 4
    # idempotent re-run inserts nothing
    counts2 = run_all(_events(spark), specs, store=store)
    assert sum(counts2.values()) == 0
    df = store.read()
    assert df.where("model_name = 'simplequery_powershell_hidden'").count() == 1
