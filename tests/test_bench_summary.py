"""The bench's final stdout line must always fit the driver's
~2000-char tail capture (BENCH_r08 postmortem: an uncapped contended
map made the official round record ``parsed: null``). No Spark needed —
this pins the shedding logic against a worst-case record."""

import json

import bench


def _record(n_contended: int) -> dict:
    return {
        "metric": "catalog_total_runtime",
        "value": 225.499,
        "unit": "sec",
        "n_ok": 202,
        "n_total": 202,
        "queries": {f"some_rather_long_entry_name_{i}": 9.999 for i in range(10)},
        "queries_file": "bench_full.json",
        "sf": 0.1,
        "n_contended": n_contended,
        "contended": {
            f"another_quite_long_entry_name_{i}": {
                "solo": 3.141,
                "vs": ["prev", "round_start"],
            }
            for i in range(n_contended)
        },
        "value_adjudicated": 214.067,
    }


def test_normal_record_keeps_all_fields():
    line = bench.build_summary_line(_record(5))
    assert len(line) <= bench.MAX_SUMMARY_CHARS
    d = json.loads(line)
    assert d["value"] == 225.499 and "contended" in d and "queries" in d


def test_r08_class_record_sheds_but_stays_parsable():
    # 95 contended entries — the r8 run that broke the tail capture
    line = bench.build_summary_line(_record(95))
    assert len(line) <= bench.MAX_SUMMARY_CHARS
    d = json.loads(line)
    # headline facts survive shedding unconditionally
    assert d["value"] == 225.499
    assert d["n_ok"] == 202
    assert d["value_adjudicated"] == 214.067
    assert d["n_contended"] == 95


def test_headline_survives_even_pathological_payloads():
    rec = _record(95)
    rec["errors"] = {f"entry_{i}": "x" * 80 for i in range(5)}
    line = bench.build_summary_line(rec)
    assert len(line) <= bench.MAX_SUMMARY_CHARS
    assert json.loads(line)["metric"] == "catalog_total_runtime"


def test_caller_record_is_not_mutated():
    # r9 advice: the shed loop popped fields from the CALLER's dict, so
    # the full-file record silently lost whatever the line shed
    rec = _record(95)
    before = json.dumps(rec, sort_keys=True)
    bench.build_summary_line(rec)
    assert json.dumps(rec, sort_keys=True) == before


def test_backstop_caps_line_even_when_headline_fields_grow():
    # r9 advice: a future oversized HEADLINE field (not one of the three
    # shed maps) used to sail past the cap and reintroduce parsed:null
    rec = _record(95)
    rec["some_future_field"] = ["x" * 50] * 100  # ~5 KB, not sheddable
    line = bench.build_summary_line(rec)
    assert len(line) <= bench.MAX_SUMMARY_CHARS
    d = json.loads(line)  # still parsable after the essential-key strip
    assert d["value"] == 225.499 and d["value_adjudicated"] == 214.067


def test_highwater_count_survives_shedding():
    rec = _record(95)
    rec["n_highwater"] = 2
    rec["highwater"] = {"bpe_train_merges": {"now": 4.97, "best3": 3.37}}
    line = bench.build_summary_line(rec)
    assert len(line) <= bench.MAX_SUMMARY_CHARS
    assert json.loads(line)["n_highwater"] == 2
