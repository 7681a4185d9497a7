"""End-to-end Spark pipeline tests: transcripts -> triples.

The oracle here is the engine itself run in-process on the same
deterministically rendered fragments — this validates the Spark plumbing
(prefilter, repartition, Arrow UDF, skolemization, per-doc dedup),
while tests/test_engine.py validates the semantics against hand-derived
golden graphs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyrdfa3_spark.plans.extract import (
    extract_tagged, extract_triples, split_outputs,
)
from pyrdfa3_spark.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def small_transcripts(spark):
    df = synth_transcripts(spark, n_conv=30, turns_per_conv=10,
                           skew_factor=5)
    df.cache().count()
    return df


def _local_oracle_triples(transcripts_rows):
    """Run the engine directly (no Spark) on carrier turns."""
    import hashlib

    from pyrdfa3_spark.functions.hostlang import (
        host_for, is_xml_host, sniff_media_type,
    )
    from pyrdfa3_spark.operators.rdfa_engine import (
        Literal, RDFaProcessor, is_bnode,
    )
    from pyrdfa3_spark.sources.dom import parse_html, parse_xml

    out = set()
    for r in transcripts_rows:
        text = r["text"]
        start, end = text.find("<"), text.rfind(">")
        if start < 0 or end <= start:
            continue
        frag = text[start:end + 1]
        host = host_for(sniff_media_type(frag))
        base = f"http://transcript.local/{r['conv_id']}/{r['turn_idx']}"
        proc = RDFaProcessor(base=base, host=host)
        try:
            root = parse_xml(frag) if is_xml_host(host) else parse_html(frag)
            triples = proc.process(root)
        except Exception:
            continue

        def sk(term):
            h = hashlib.sha256(
                f"{r['conv_id']}\x1f{r['turn_idx']}\x1f{term}".encode()
            ).hexdigest()[:24]
            return "_:sk" + h

        for s, p, o in triples:
            s2 = sk(s) if is_bnode(s) else s
            if isinstance(o, Literal):
                out.add((r["conv_id"], r["turn_idx"], s2, p, o.value,
                         False, o.lang, o.datatype))
            else:
                o2 = sk(o) if is_bnode(o) else o
                out.add((r["conv_id"], r["turn_idx"], s2, p, o2,
                         True, None, None))
    return out


def _collect_triples(df):
    return {
        (r["conv_id"], r["turn_idx"], r["subj"], r["pred"], r["obj"],
         r["obj_is_iri"], r["obj_lang"], r["obj_datatype"])
        for r in df.collect()
    }


def test_pipeline_matches_local_oracle(spark, small_transcripts):
    actual = _collect_triples(extract_triples(small_transcripts))
    expected = _local_oracle_triples(
        [r.asDict() for r in small_transcripts.collect()])
    missing = expected - actual
    extra = actual - expected
    assert not missing and not extra, (
        f"missing={list(missing)[:5]} extra={list(extra)[:5]}")
    assert len(actual) > 100


def test_parallelism_invariance(spark, small_transcripts):
    a = _collect_triples(extract_triples(small_transcripts,
                                         repartition_to=2))
    b = _collect_triples(extract_triples(small_transcripts,
                                         repartition_to=17))
    assert a == b


def test_diagnostics_surface_bad_datatypes(spark, small_transcripts):
    tagged = extract_tagged(small_transcripts)
    _, diags = split_outputs(tagged)
    codes = {r["code"] for r in diags.collect()}
    # template 3 plants incompatible literals; template 6 uses xmlns:
    assert "incompatible-literal" in codes
    assert "xmlns-deprecated" in codes


def test_per_turn_text_stability(spark, small_transcripts):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering across two independent generations."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    a = (small_transcripts
         .withColumn("rn", F.row_number().over(w))
         .select("conv_id", "rn", "text"))
    again = synth_transcripts(spark, n_conv=30, turns_per_conv=10,
                              skew_factor=5)
    b = (again.withColumn("rn", F.row_number().over(w))
         .select("conv_id", "rn", F.col("text").alias("text2")))
    joined = a.join(b, ["conv_id", "rn"], "full_outer")
    mismatches = joined.filter(
        (F.col("text").isNull()) | (F.col("text2").isNull()) |
        (F.col("text") != F.col("text2"))).count()
    assert mismatches == 0


def test_skew_fixture_shape(spark, small_transcripts):
    counts = (small_transcripts.groupBy("conv_id").count()
              .orderBy(F.desc("count")).collect())
    assert counts[0]["conv_id"] == "conv-000000"
    assert counts[0]["count"] == 5 * 10
    assert counts[1]["count"] == 10


def test_turtle_only_document_survives_prefilter(spark):
    """A turn whose only markup is an embedded turtle island (no RDFa
    attribute at all) must still reach the extraction UDF (E14)."""
    from pyrdfa3_spark.plans.extract import extract_triples

    rows = [("c9", 0, "u",
             'x <script type="text/turtle">@prefix s: '
             '<http://schema.org/> . <#a> s:v 3 .</script> y',
             "b", None)]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    out = extract_triples(t).collect()
    assert len(out) == 1 and out[0]["pred"] == "http://schema.org/v"


def test_max_doc_bytes_guard(spark):
    """Oversized fragments are skipped with a visible doc-too-large
    diagnostic, never a task failure or a silent drop."""
    from pyrdfa3_spark.plans.extract import extract_tagged, split_outputs

    big = '<div about="#x"><span property="p:v">' + "y" * 5000 + \
        "</span></div>"
    small = '<div about="#s" vocab="http://schema.org/">' \
        '<span property="name">ok</span></div>'
    t = spark.createDataFrame(
        [("c1", 0, "u", big, "b", None), ("c1", 1, "u", small, "b", None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    triples, diags = split_outputs(
        extract_tagged(t, max_doc_bytes=1000))
    trows = triples.collect()
    drows = diags.collect()
    assert all(r["turn_idx"] == 1 for r in trows) and trows
    assert len(drows) == 1 and drows[0]["code"] == "doc-too-large"
    assert "5043" in drows[0]["message"] or "bytes" in drows[0]["message"]

    # guard off by default: the same corpus extracts everything
    all_triples, _ = split_outputs(extract_tagged(t))
    assert {r["turn_idx"] for r in all_triples.collect()} == {0, 1}


def test_cached_vocab_ttl_refresh(spark, tmp_path):
    """Snapshot cache with Expires semantics (reference
    pyRdfa/rdfs/cache.py:226-300): a fresh snapshot serves reads
    without re-running the loader; past its expiry the loader re-runs
    and the snapshot is overwritten; ttl=None never expires."""
    from pyrdfa3_spark.sources.vocab import cached_vocab

    calls = []

    def loader(iri):
        calls.append(iri)
        return spark.createDataFrame(
            [(iri, "p:ver", str(len(calls)))], ["subj", "pred", "obj"])

    d = str(tmp_path)
    v = "http://example.org/vocab#"
    # miss -> load; hit inside ttl -> no load
    df1 = cached_vocab(spark, d, v, loader, ttl_seconds=100, now=1000.0)
    df2 = cached_vocab(spark, d, v, loader, ttl_seconds=100, now=1099.0)
    assert calls == [v]
    assert df1.collect()[0]["obj"] == df2.collect()[0]["obj"] == "1"
    # past expiry -> refresh (snapshot overwritten, new expiry recorded)
    df3 = cached_vocab(spark, d, v, loader, ttl_seconds=100, now=1100.0)
    assert calls == [v, v]
    assert df3.collect()[0]["obj"] == "2"
    # the refreshed snapshot serves again inside its own ttl
    cached_vocab(spark, d, v, loader, ttl_seconds=100, now=1150.0)
    assert calls == [v, v]

    # ttl=None: never expires, even far in the future
    v2 = "http://example.org/other#"
    cached_vocab(spark, d, v2, loader, now=1000.0)
    cached_vocab(spark, d, v2, loader, now=10**12)
    assert calls.count(v2) == 1
    # a snapshot written WITHOUT a ttl still ages when a later reader
    # requests one, counting from its created stamp (1000): inside
    # the window it serves, past it the loader re-runs
    cached_vocab(spark, d, v2, loader, ttl_seconds=50, now=1040.0)
    assert calls.count(v2) == 1
    cached_vocab(spark, d, v2, loader, ttl_seconds=50, now=1051.0)
    assert calls.count(v2) == 2
