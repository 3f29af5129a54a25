"""Physical-plan quality checks — the "would this survive 100×?" gate.

The reference hand-places its optimizations in control flow (SURVEY
§4.1); here Catalyst places them, and these helpers make the placement
*testable*: tests assert that a catalog query's physical plan broadcasts
its dimensions, pushes filters into the parquet scan, prunes columns,
and never degenerates into a cartesian product. A plan regression then
fails CI instead of shipping a 100 TB accident.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (what .explain prints)."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def count_occurrences(df: DataFrame, pattern: str) -> int:
    return len(re.findall(pattern, plan_text(df)))


def num_shuffles(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (each fully reshuffles its
    input). Counts the formatted plan's detail headers — ``(4) Exchange``
    — so tree and detail sections aren't double-counted; broadcast
    exchanges are excluded (they move only the small side).

    AQE may later coalesce partitions within an exchange, but the
    exchange count itself is the structural cost to minimize.
    """
    return len(re.findall(r"^\(\d+\) Exchange\b", plan_text(df), re.MULTILINE))


def has_broadcast_join(df: DataFrame) -> bool:
    return count_occurrences(df, r"BroadcastHashJoin|BroadcastNestedLoopJoin") > 0


def has_cartesian(df: DataFrame) -> bool:
    return count_occurrences(df, r"CartesianProduct") > 0


def global_windows(df: DataFrame) -> list[str]:
    """Window specs with NO partition columns — the single-partition-sort
    scale killer (every corpus row funnels through one task). Returns the
    offending ``windowspecdefinition`` argument lists; an empty list is
    the 100 TB-safe state the catalog-wide gate asserts.

    Detection: in the plan text a windowspecdefinition's arguments are
    [partition exprs..., sort orders..., frame]; sort orders always
    render with a direction (``ASC``/``DESC NULLS ...``) and partition
    exprs never do — so a spec whose FIRST argument is a sort order (or
    the frame itself) has an empty partition clause. A first argument
    with no attribute reference (no ``#<exprId>``, e.g. a literal
    ``partitionBy(lit(0))``) is flagged too: a constant partition spec
    funnels every row through one task exactly like no partition spec.
    """
    text = plan_text(df)
    offenders: list[str] = []
    for m in re.finditer(r"windowspecdefinition\(", text):
        depth, i = 1, m.end()
        while depth and i < len(text):
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
            i += 1
        spec = text[m.end() : i - 1]
        first, d = "", 0
        for ch in spec:
            if ch == "," and d == 0:
                break
            first += ch
            if ch == "(":
                d += 1
            elif ch == ")":
                d -= 1
        first = first.strip()
        # "no attribute reference (#) in the partition expression" is a
        # heuristic: spark_partition_id()/rand(seed) DO distribute yet
        # render without '#', so whitelist them; a fully constant-folded
        # literal partition key would still (correctly) be flagged —
        # known limitation, acceptable for a lint that gates the catalog
        distributes_without_attr = re.match(
            r"(spark_partition_id|rand|randn)\(", first
        )
        if (
            first.startswith("specifiedwindowframe")
            or re.search(r"\b(ASC|DESC)\b", first)
            or ("#" not in first and not distributes_without_attr)
        ):
            offenders.append(spec)
    return offenders


def pushed_filters(df: DataFrame) -> list[str]:
    """All non-empty PushedFilters lists in the scan nodes."""
    return [
        m
        for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan_text(df))
        if m.strip()
    ]


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each file scan — verifies column pruning (a scan
    reading all columns for a narrow projection is a plan bug)."""
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan_text(df))


def assert_scale_ready(
    df: DataFrame,
    max_shuffles: int | None = None,
    require_broadcast: bool = False,
    require_pushed_filter: bool = False,
    max_scan_columns: int | None = None,
) -> None:
    """One-call plan gate used by the plan-quality tests."""
    problems: list[str] = []
    if has_cartesian(df):
        problems.append("plan contains CartesianProduct")
    if max_shuffles is not None and (n := num_shuffles(df)) > max_shuffles:
        problems.append(f"{n} shuffles > allowed {max_shuffles}")
    if require_broadcast and not has_broadcast_join(df):
        problems.append("expected a broadcast join, found none")
    if require_pushed_filter and not pushed_filters(df):
        problems.append("no filter pushed into any scan")
    if max_scan_columns is not None:
        widths = [len(s.split(",")) for s in read_schemas(df) if s]
        if widths and max(widths) > max_scan_columns:
            problems.append(f"widest scan reads {max(widths)} cols > {max_scan_columns}")
    if problems:
        raise AssertionError("; ".join(problems) + "\n--- plan ---\n" + plan_text(df))


#: field-name fingerprints of the two true dimension tables — the only
#: relations whose RAW scans are always broadcast-sized by design
#: (nation 25 rows, region 5 rows at every SF)
_DIM_FIELD_PREFIXES = ("n_", "r_")


def derived_broadcasts(df: DataFrame) -> list[str]:
    """BroadcastExchange subtrees whose input is DERIVED from a
    corpus-scale relation via a keyed aggregate or a join — the r6 sf1
    failure class: Spark's size estimate for a relation is frozen at
    scan time and never updated through joins/aggregates, so a derived
    side that GROWS with the corpus (LSH candidate pairs: 41.7k rows at
    sf0.1 -> 3.8M at sf1) keeps its tiny estimate and gets
    auto-broadcast until the driver dies. Returns one description per
    offending exchange; [] is the 100 TB-safe state.

    Sanctioned shapes (not flagged):
    - raw scans, corpus-sized or not: their estimates come from real
      file statistics, so the auto-broadcast threshold sees the truth
      (and grows past it with the data);
    - sides whose ROOT (through row-preserving unary nodes) is a
      key-less aggregate or a limit/top-k: ≤1 row / ≤k rows by
      construction at any SF, whatever the subtree below computed;
    - LocalTableScan/in-memory literals: driver-sized already
      (LogicalRDD/localCheckpoint relations additionally carry
      unknown=huge stats, so the planner never auto-broadcasts them);
    - joins/aggregates whose subtree touches no corpus-table scan.

    Keyed aggregates over corpus scans CAN be legitimately bounded
    (group by a closed status/priority domain, a sketch's cell grid,
    a calendar bucket) — those are whitelisted BY NAME in the
    catalog-wide gate with the boundedness argument, so every
    exception is visible and justified in one place.
    """
    plan = df._jdf.queryExecution().executedPlan()
    flags: list[str] = []

    def _cls(node) -> str:
        return node.getClass().getSimpleName()

    def _children(node):
        ch = node.children()
        return [ch.apply(i) for i in range(ch.size())]

    def _subtree_facts(node, facts: dict) -> None:
        name = _cls(node)
        if name == "AdaptiveSparkPlanExec":
            _subtree_facts(node.executedPlan(), facts)
            return
        if name.endswith("QueryStageExec"):
            _subtree_facts(node.plan(), facts)
            return
        if name == "ReusedExchangeExec":
            _subtree_facts(node.child(), facts)
            return
        if "Join" in name or name == "CartesianProductExec":
            facts["joins"].append(name)
        if name.endswith("AggregateExec"):
            try:
                keyed = node.groupingExpressions().size() > 0
            except Exception:
                keyed = True  # unknown aggregate shape: be conservative
            if keyed:
                facts["keyed_aggs"].append(name)
        if name in ("FileSourceScanExec", "BatchScanExec"):
            try:
                fields = list(node.schema().fieldNames())
            except Exception:
                fields = []
            dim = bool(fields) and all(
                f.startswith(_DIM_FIELD_PREFIXES) for f in fields
            )
            if dim:
                # field prefixes alone can false-positive on a corpus
                # projection pruned to n_*/r_* columns (e.g. a
                # documents scan reading only n_tokens) — require the
                # scan's file location to actually be one of the two
                # dimension tables before exempting it from the gate.
                try:
                    desc = node.toString()
                except Exception:
                    desc = ""
                dim = ("nation.parquet" in desc) or ("region.parquet" in desc)
            (facts["dim_scans"] if dim else facts["corpus_scans"]).append(
                ",".join(fields[:4])
            )
        for c in _children(node):
            _subtree_facts(c, facts)

    def _root_bounded(node) -> bool:
        """True when the broadcast input's ROOT shrinks to a bounded
        cardinality regardless of its subtree: a key-less (global)
        aggregate or a limit/top-k, reached through single-child
        row-preserving nodes."""
        cur = node
        while True:
            name = _cls(cur)
            if name.endswith("AggregateExec"):
                try:
                    return cur.groupingExpressions().size() == 0
                except Exception:
                    return False
            if "Limit" in name or name == "TakeOrderedAndProjectExec":
                return True
            ch = _children(cur)
            if len(ch) != 1:
                return False
            if name in (
                "ProjectExec",
                "FilterExec",
                "SortExec",
                "CoalesceExec",
                "ShuffleExchangeExec",
                "BroadcastExchangeExec",
                "WholeStageCodegenExec",
                "InputAdapter",
                "ColumnarToRowExec",
                "AQEShuffleReadExec",
            ):
                cur = ch[0]
                continue
            return False

    def _walk(node) -> None:
        name = _cls(node)
        if name == "AdaptiveSparkPlanExec":
            _walk(node.executedPlan())
            return
        if name.endswith("QueryStageExec"):
            _walk(node.plan())
            return
        if name == "BroadcastExchangeExec":
            if _root_bounded(node):
                for c in _children(node):
                    _walk(c)
                return
            facts = {
                "joins": [],
                "keyed_aggs": [],
                "corpus_scans": [],
                "dim_scans": [],
            }
            for c in _children(node):
                _subtree_facts(c, facts)
            derived = facts["corpus_scans"] and (
                facts["joins"] or facts["keyed_aggs"]
            )
            if derived:
                flags.append(
                    f"broadcast of derived side: joins={facts['joins']} "
                    f"keyed_aggs={facts['keyed_aggs']} "
                    f"corpus_scans={facts['corpus_scans'][:3]}"
                )
            # keep walking inside: a nested exchange deeper in the
            # broadcast subtree is a separate decision
        for c in _children(node):
            _walk(c)

    _walk(plan)
    return flags


def scanned_files(df: DataFrame) -> int:
    """Total "number of files read" across the plan's file scans, read
    from the executed plan's metrics AFTER running the query — the
    runtime-observable evidence of partition/file pruning.
    (``Dataset.inputFiles`` lists the PRE-pruning file index and cannot
    see pruning at all.)"""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()

    total = 0

    def _walk(node):
        nonlocal total
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            _walk(node.executedPlan())
            return
        if name.endswith("QueryStageExec"):  # AQE stage boundary: descend
            _walk(node.plan())
            return
        m = node.metrics()
        if m.contains("numFiles"):
            total += m.apply("numFiles").value()
        ch = node.children()
        for i in range(ch.size()):
            _walk(ch.apply(i))

    _walk(plan)
    return int(total)


def broadcast_row_counts(df: DataFrame) -> list[int]:
    """Runtime ``numOutputRows`` of every BroadcastExchange in the
    EXECUTED plan (the query is run here) — the measured cardinality
    of each side the driver actually collected and shipped. This is
    what turns a whitelisted "this broadcast is bounded" argument into
    a per-SF fact: assert the returned counts under an explicit bound
    at the largest local SF (tests/test_broadcast_bounds_sf1.py).
    ReusedExchange references are skipped (the original is counted)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    counts: list[int] = []

    def _walk(node):
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            _walk(node.executedPlan())
            return
        if name.endswith("QueryStageExec"):
            _walk(node.plan())
            return
        if name == "ReusedExchangeExec":
            return
        if name == "BroadcastExchangeExec":
            m = node.metrics()
            if m.contains("numOutputRows"):
                counts.append(int(m.apply("numOutputRows").value()))
        ch = node.children()
        for i in range(ch.size()):
            _walk(ch.apply(i))

    _walk(plan)
    return counts
