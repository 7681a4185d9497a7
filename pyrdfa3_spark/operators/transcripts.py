"""Conversation-level operators over the transcript input shape
``(conv_id, turn_idx, role, text, tool, ts)`` — the per-conversation
integrity, stitching, and timing surface a transcript lake runs before
extraction and training-mix assembly.

All three operators share one scale shape: a single ``groupBy
(conv_id)`` with map-side partial aggregation (collect_list partials
included — ObjectHashAggregate), so each is one shuffle keyed on the
table's natural partitioning column.  In-row arrays are bounded by
conversation length (thousands of turns), never corpus size; the
100×-skewed conv-000000 fixture (FIXTURES.md §1) stays a single
bounded group.  Ordering inside a conversation NEVER relies on row
order: turns are sorted in-row by ``(turn_idx, ...)`` structs, so
results are identical under any partitioning/parallelism — the north
rule's stable-turn-ordering requirement as algebra instead of a global
sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conversation_stats(tr: DataFrame) -> DataFrame:
    """Per-conversation integrity + shape metrics: turn counts, role
    mix, tool-turn share, wall-clock span, and turn-index health
    (duplicate turn_idx rows / index gaps — the two ways "stable turn
    ordering" breaks upstream).  Output: conv_id, n_turns,
    n_tool_turns, n_roles, first_ms, last_ms, duration_ms,
    n_dup_turns, has_gaps (0/1 int — boolean cells normalize
    differently across downstream harnesses, r04 driver hash-red)."""
    ms = F.unix_millis(F.col("ts").cast("timestamp_ltz"))
    return (tr
            .select("conv_id", "turn_idx", "role", "tool", ms.alias("ms"))
            .groupBy("conv_id")
            .agg(F.count("*").cast("bigint").alias("n_turns"),
                 F.sum((F.col("tool") != "").cast("int")).cast("bigint")
                 .alias("n_tool_turns"),
                 F.countDistinct("role").cast("bigint").alias("n_roles"),
                 F.min("ms").alias("first_ms"),
                 F.max("ms").alias("last_ms"),
                 (F.max("ms") - F.min("ms")).alias("duration_ms"),
                 (F.count("*") - F.countDistinct("turn_idx"))
                 .cast("bigint").alias("n_dup_turns"),
                 (F.max("turn_idx") + 1 != F.countDistinct("turn_idx"))
                 .cast("int").alias("has_gaps")))


def stitch_conversations(tr: DataFrame, sep: str = "\n",
                         with_roles: bool = True) -> DataFrame:
    """Concatenate each conversation's turns into one document in
    stable ``turn_idx`` order (ties broken by ts, then text, so the
    output is deterministic even on corrupted duplicate-index input) —
    the conversation->document bridge that lets every document-level
    operator (dedup, quality, packing) run on transcripts.  Output:
    conv_id, n_turns, doc_text."""
    item = F.struct(F.col("turn_idx"), F.col("ts"),
                    (F.concat(F.col("role"), F.lit(": "), F.col("text"))
                     if with_roles else F.col("text")).alias("line"))
    return (tr
            .groupBy("conv_id")
            .agg(F.count("*").cast("bigint").alias("n_turns"),
                 F.array_sort(F.collect_list(item)).alias("items"))
            .select("conv_id", "n_turns",
                    F.concat_ws(sep, F.transform("items",
                                                 lambda s: s.line))
                    .alias("doc_text")))


def turn_latency(tr: DataFrame) -> DataFrame:
    """Per-conversation inter-turn timing: mean / max gap between
    consecutive turns in stable turn order — the responsiveness signal
    agent-transcript curation filters on (a conversation whose gaps
    span hours is usually several sessions glued together).  Output:
    conv_id, n_gaps, mean_gap_ms (4 dp), max_gap_ms; single-turn
    conversations report zero gaps with NULL means.

    The consecutive-turn deltas are computed in-row over the sorted
    struct array (zip_with against its own shift — the
    repetition_metrics bigram shape), not with a lag window: same one
    aggregation shuffle as the other operators, no window exchange."""
    item = F.struct(F.col("turn_idx"), F.col("ts"))
    grouped = (tr
               .groupBy("conv_id")
               .agg(F.array_sort(F.collect_list(item)).alias("items")))
    ts_ms = F.transform(
        "items", lambda s: F.unix_millis(s.ts.cast("timestamp_ltz")))
    gaps = F.zip_with(F.slice(ts_ms, 2, F.size(ts_ms)),
                      ts_ms, lambda later, earlier: later - earlier)
    gaps = F.filter(gaps, lambda g: g.isNotNull())
    n_gaps = F.size(gaps)
    return grouped.select(
        "conv_id",
        n_gaps.cast("bigint").alias("n_gaps"),
        F.when(n_gaps > 0, F.round(
            F.aggregate(gaps, F.lit(0).cast("bigint"),
                        lambda a, g: a + g).cast("double") / n_gaps, 4))
        .alias("mean_gap_ms"),
        F.when(n_gaps > 0, F.array_max(gaps)).cast("bigint")
        .alias("max_gap_ms"))


def merge_consecutive_turns(tr: DataFrame, sep: str = "\n") -> DataFrame:
    """Collapse runs of consecutive SAME-ROLE turns into one turn each
    — the transcript-repair pass chat-training pipelines run before
    alternation-sensitive formatting (a user double-send or a
    streaming assistant split otherwise breaks the role-alternation
    invariant).  Turns merge in stable ``turn_idx`` order; merged
    turns are re-indexed densely 0..k-1.  Output: conv_id, turn_idx,
    role, text, n_merged.

    Scale shape: the module's single-shuffle contract — one
    ``groupBy(conv_id)`` collecting the (turn_idx, role, text) structs,
    an in-row ``aggregate`` fold that appends-or-merges each sorted
    turn (linear in conversation length), and one ``posexplode`` back
    to rows.  No windows; resilient to any partitioning.
    """
    item = F.struct("turn_idx", "role", "text")
    empty = F.array().cast(
        "array<struct<role:string,text:string,n_merged:int>>")
    merged = F.aggregate(
        F.array_sort(F.collect_list(item)), empty,
        lambda acc, t: F.when(
            (F.size(acc) > 0)
            & (F.try_element_at(acc, F.lit(-1))["role"] == t["role"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.struct(
                    t["role"].alias("role"),
                    F.concat_ws(sep, F.try_element_at(acc, F.lit(-1))["text"],
                                t["text"]).alias("text"),
                    (F.try_element_at(acc, F.lit(-1))["n_merged"] + 1)
                    .alias("n_merged"))))
        ).otherwise(F.concat(acc, F.array(F.struct(
            t["role"].alias("role"), t["text"].alias("text"),
            F.lit(1).alias("n_merged"))))))
    return (tr.groupBy("conv_id")
            .agg(merged.alias("m"))
            .select("conv_id", F.posexplode("m").alias("turn_idx", "t"))
            .select("conv_id", "turn_idx",
                    F.col("t.role").alias("role"),
                    F.col("t.text").alias("text"),
                    F.col("t.n_merged").cast("bigint").alias("n_merged")))


def truncate_conversations(tr: DataFrame,
                           max_tokens: int = 2048) -> DataFrame:
    """Keep each conversation's longest PREFIX of turns whose
    cumulative whitespace-token count fits ``max_tokens`` — the
    context-window budgeting pass before packing (truncating the tail
    preserves the conversation opening; a turn that would overflow the
    budget is dropped along with everything after it).  Output: the
    surviving turns (conv_id, turn_idx, role, text, n_tokens,
    cum_tokens) in stable order.

    Scale shape: one ``groupBy(conv_id)``; the prefix scan is an
    in-row ``aggregate`` running sum over the sorted turn structs
    (linear per conversation), then ``posexplode`` of the kept slice.
    No windows.
    """
    # NULL text counts as zero tokens — without the coalesce a null
    # turn would null the running sum and silently reset the budget
    ntok = F.coalesce(
        F.size(F.filter(
            F.split(F.trim(F.regexp_replace("text", r"\s+", " ")), " "),
            lambda x: x != "")),
        F.lit(0))
    item = F.struct(F.col("turn_idx").cast("int").alias("turn_idx"),
                    "role", "text", ntok.alias("n_tokens"))
    empty = F.array().cast(
        "array<struct<turn_idx:int,role:string,text:string,"
        "n_tokens:int,cum_tokens:bigint,keep:boolean>>")
    folded = F.aggregate(
        F.array_sort(F.collect_list(item)), empty,
        lambda acc, t: F.concat(acc, F.array(F.struct(
            t["turn_idx"].alias("turn_idx"), t["role"].alias("role"),
            t["text"].alias("text"), t["n_tokens"].alias("n_tokens"),
            (F.coalesce(F.try_element_at(acc, F.lit(-1))["cum_tokens"],
                        F.lit(0).cast("bigint"))
             + t["n_tokens"]).alias("cum_tokens"),
            ((F.coalesce(F.try_element_at(acc, F.lit(-1))["cum_tokens"],
                         F.lit(0).cast("bigint"))
              + t["n_tokens"] <= max_tokens)
             & F.coalesce(F.try_element_at(acc, F.lit(-1))["keep"], F.lit(True)))
            .alias("keep")))))
    return (tr.groupBy("conv_id")
            .agg(folded.alias("m"))
            .select("conv_id",
                    F.explode(F.filter("m", lambda t: t["keep"]))
                    .alias("t"))
            .select("conv_id",
                    F.col("t.turn_idx").alias("turn_idx"),
                    F.col("t.role").alias("role"),
                    F.col("t.text").alias("text"),
                    F.col("t.n_tokens").cast("bigint").alias("n_tokens"),
                    F.col("t.cum_tokens").alias("cum_tokens")))


def tool_usage(tr: DataFrame) -> DataFrame:
    """Per-tool call analytics over agent transcripts: how often each
    tool fires, how many conversations touch it, its share of all
    turns, and its latency-to-next-turn profile (the tool-roundtrip
    proxy: gap between a tool turn and the conversation's next turn
    in stable order; a conversation-final tool turn has no successor
    and contributes no latency).  Output: (tool, n_calls, n_convs,
    turn_share, n_latencies, mean_latency_ms, max_latency_ms), one
    row per non-empty tool.

    Scale shape: the module discipline — ONE groupBy(conv_id) with
    in-row sorted-array folds (no lag window; ``F.get`` is the
    OOB-NULL next-element lookup, ANSI-safe), an explode bounded by
    tool-turn count, and one partially-aggregated groupBy(tool).
    The turn total is a 1-row broadcast.  Latency means divide an
    exact bigint sum (order-independent) — cross-engine stable.
    """
    item = F.struct(F.col("turn_idx"), F.col("ts"), F.col("tool"))
    grouped = (tr.groupBy("conv_id")
               .agg(F.array_sort(F.collect_list(item)).alias("items")))
    ms = F.transform(
        "items", lambda s: F.unix_millis(s.ts.cast("timestamp_ltz")))
    with_ms = grouped.select("conv_id", "items", ms.alias("ms"))
    pairs = F.filter(
        F.transform(
            "items",
            lambda s, i: F.struct(
                s.tool.alias("tool"),
                (F.get("ms", i + 1) - F.get("ms", i)).alias("lat"))),
        lambda p: p.tool != "")
    calls = (with_ms
             .select("conv_id", F.explode(pairs).alias("p"))
             .select("conv_id", F.col("p.tool").alias("tool"),
                     F.col("p.lat").alias("lat")))
    n_calls = F.count(F.lit(1))
    lat_sum = F.sum("lat").cast("bigint")
    n_lat = F.count("lat")
    per_tool = calls.groupBy("tool").agg(
        n_calls.cast("bigint").alias("n_calls"),
        F.countDistinct("conv_id").cast("bigint").alias("n_convs"),
        n_lat.cast("bigint").alias("n_latencies"),
        F.when(n_lat > 0,
               F.round(lat_sum.cast("double") / n_lat, 4))
        .alias("mean_latency_ms"),
        F.max("lat").cast("bigint").alias("max_latency_ms"))
    total = tr.agg(F.count(F.lit(1)).cast("bigint").alias("_total"))
    return (per_tool.crossJoin(F.broadcast(total))
            .select("tool", "n_calls", "n_convs",
                    F.round(F.col("n_calls") /
                            F.col("_total").cast("double"), 6)
                    .alias("turn_share"),
                    "n_latencies", "mean_latency_ms",
                    "max_latency_ms"))


def role_transitions(tr: DataFrame) -> DataFrame:
    """Corpus-wide role-transition matrix over agent transcripts:
    counts of every consecutive ``(from_role, to_role)`` pair in
    stable turn order — the conversation-structure health signal
    (user->user runs mean dropped assistant turns; tool->tool runs
    mean unanswered tool results) that drives repair/filter decisions
    upstream of :func:`merge_consecutive_turns`.  Output:
    (from_role, to_role, n, n_convs).

    Scale shape: module discipline — ONE groupBy(conv_id) with the
    in-row sorted-array shift (zip_with against its own tail, the
    turn_latency shape), an explode bounded by turn count, and one
    partially-aggregated groupBy(from_role, to_role).  No window.
    """
    item = F.struct(F.col("turn_idx"), F.col("role"))
    grouped = (tr.groupBy("conv_id")
               .agg(F.array_sort(F.collect_list(item)).alias("items")))
    roles = F.transform("items", lambda s: s.role)
    # slice length must be size-based: a constant INT_MAX length
    # overflows slice's internal start+length computation and yields
    # NULLs (same shape turn_latency uses)
    pairs = F.zip_with(
        roles, F.slice(roles, 2, F.size(roles)),
        lambda a, b: F.struct(a.alias("from_role"), b.alias("to_role")))
    pairs = F.filter(pairs, lambda p: p.to_role.isNotNull())
    return (grouped
            .select("conv_id", F.explode(pairs).alias("p"))
            .groupBy(F.col("p.from_role").alias("from_role"),
                     F.col("p.to_role").alias("to_role"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.countDistinct("conv_id").cast("bigint")
                 .alias("n_convs")))
