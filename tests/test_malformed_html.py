"""Malformed-HTML parity corpus (WHATWG HTML §13.2.6 tree-construction
fixups; html5lib's documented behaviour — the parser the reference uses
at pyRdfa/__init__.py:619-649 but which is absent in this sandbox).

Each fixture encodes the SPEC-DOCUMENTED fixed-up tree as a hand-written
expectation (independent of both engines).  The one recovery where this
repo's parser deliberately diverges from html5lib — mis-nested
formatting elements, which the adoption agency would re-open — must
emit a diagnostic, never a silently different tree, and must never lose
text content.  These are pure-Python parser tests (no Spark session).
"""

from __future__ import annotations

import pytest

from pyrdfa3_spark.sources.dom import Node, parse_html


def _shape(n):
    """(tag, [children]) skeleton with non-whitespace text leaves."""
    if isinstance(n, str):
        s = n.strip()
        return s if s else None
    kids = [x for x in (_shape(c) for c in n.children) if x is not None]
    return (n.tag, kids)


def _parse(text, diags=None):
    return _shape(parse_html(text, diagnostics=diags))


# --------------------------------------------------------------------- #
# spec-equivalent fixups: the fixed-up tree must MATCH html5lib's
# --------------------------------------------------------------------- #

def test_unclosed_li_are_siblings():
    assert _parse("<ul><li>a<li>b<li>c</ul>") == (
        "ul", [("li", ["a"]), ("li", ["b"]), ("li", ["c"])])


def test_li_closes_through_div_but_not_past_list():
    # §13.2.6.4.7: the li walk skips non-special + address/div/p and
    # closes the open li — the div ends with it
    assert _parse("<ul><li><div>a<li>b</ul>") == (
        "ul", [("li", [("div", ["a"])]), ("li", ["b"])])
    # a nested list is a special boundary: its li stays nested
    assert _parse("<ul><li>a<ul><li>b</ul></ul>") == (
        "ul", [("li", ["a", ("ul", [("li", ["b"])])])])


def test_unclosed_p_and_block_closes_p():
    assert _parse("<div><p>one<p>two</div>") == (
        "div", [("p", ["one"]), ("p", ["two"])])
    # a block start tag closes an open p (button scope)
    assert _parse("<body><p>text<div>block</div></body>") == (
        "body", [("p", ["text"]), ("div", ["block"])])
    # ... even when the markup is well-formed XML (fast path must
    # defer to the HTML5 rule, not the XML nesting)
    assert _parse("<body><p>a<div>b</div></p></body>") == (
        "body", [("p", ["a"]), ("div", ["b"]), ("p", [])])


def test_p_not_closed_across_button_scope_boundary():
    # button is a scope boundary: the inner <p> must NOT close the
    # outer one — it nests inside the button
    assert _parse("<p>a<button>b<p>c</button></p>") == (
        "p", ["a", ("button", ["b", ("p", ["c"])])])


def test_stray_end_p_inserts_empty_p():
    assert _parse("<div>a</p>b</div>") == ("div", ["a", ("p", []), "b"])


def test_end_br_acts_as_br():
    assert _parse("<div>a</br>b</div>") == (
        "div", ["a", ("br", []), "b"])


def test_dt_dd_autoclose():
    assert _parse("<dl><dt>t1<dd>d1<dt>t2<dd>d2</dl>") == (
        "dl", [("dt", ["t1"]), ("dd", ["d1"]),
               ("dt", ["t2"]), ("dd", ["d2"])])


def test_implied_tbody_and_tr():
    assert _parse("<table><tr><td>a</td></tr></table>") == (
        "table", [("tbody", [("tr", [("td", ["a"])])])])
    # td directly under table implies both tbody and tr
    assert _parse("<table><td>a</table>") == (
        "table", [("tbody", [("tr", [("td", ["a"])])])])
    # unclosed cells/rows
    assert _parse("<table><tr><td>a<td>b<tr><td>c</table>") == (
        "table", [("tbody", [("tr", [("td", ["a"]), ("td", ["b"])]),
                             ("tr", [("td", ["c"])])])])


def test_foster_parenting_element_and_text():
    # a div (with RDFa attributes!) misplaced in table context is
    # re-homed BEFORE the table — ancestor chains for context
    # propagation follow the html5lib tree
    got = parse_html('<body><table><div property="p">x</div>'
                     "<tr><td>a</td></tr></table></body>")
    assert _shape(got) == (
        "body", [("div", ["x"]),
                 ("table", [("tbody", [("tr", [("td", ["a"])])])])])
    div = got.element_children()[0]
    assert div.tag == "div" and div.get("property") == "p"
    assert div.parent.tag == "body"
    # stray text in table context fosters out too; cell text stays
    assert _parse("<body><table>oops<tr><td>a</td></table></body>") == (
        "body", ["oops",
                 ("table", [("tbody", [("tr", [("td", ["a"])])])])])
    # the same shapes as WELL-FORMED XML must build the same tree
    # (fast path defers to the tolerant parser on table-context
    # violations)
    assert _parse("<body><table><div>x</div><tbody><tr><td>a</td></tr>"
                  "</tbody></table></body>") == (
        "body", [("div", ["x"]),
                 ("table", [("tbody", [("tr", [("td", ["a"])])])])])


def test_foster_parented_element_keeps_collecting_content():
    # the fostered element is still OPEN: subsequent content belongs
    # to it, not to the table
    assert _parse("<body><table><div>x<span>y</span></div>"
                  "<tr><td>a</td></table></body>") == (
        "body", [("div", ["x", ("span", ["y"])]),
                 ("table", [("tbody", [("tr", [("td", ["a"])])])])])


def test_stray_end_tags_ignored():
    assert _parse("<div>a</span>b</div>") == ("div", ["a", "b"])
    assert _parse("<div>a</table>b</div>") == ("div", ["a", "b"])


# --------------------------------------------------------------------- #
# mis-nested formatting: active-formatting reconstruction (the
# adoption agency's common cases), furthest-block residual -> diagnostic
# --------------------------------------------------------------------- #

def test_misnested_formatting_reconstructs():
    """The canonical adoption-agency case builds html5lib's exact
    tree: </b> implicitly closes the open <i>, which re-opens (as a
    clone) around the following text."""
    diags: list = []
    got = parse_html("<div><b>one<i>two</b>three</i>four</div>",
                     diagnostics=diags)
    assert _shape(got) == (
        "div", [("b", ["one", ("i", ["two"])]), ("i", ["three"]),
                "four"])
    assert got.text_content() == "onetwothreefour"
    assert diags == []  # reconstructed, no divergence to report


def test_block_closing_p_reconstructs_formatting():
    diags: list = []
    got = parse_html("<p><b>one<p>two", diagnostics=diags)
    # html5lib: the <b> re-opens inside the second p ("two" is bold)
    assert _shape(got) == (
        "html", [("p", [("b", ["one"])]), ("p", [("b", ["two"])])])
    assert diags == []


def test_reconstruction_chains_and_cancellation():
    # the clone itself re-closes and re-opens across a third p
    got = parse_html('<div><p><b property="x">a<p>b<p>c</div>')
    assert _shape(got) == (
        "div", [("p", [("b", ["a"])]), ("p", [("b", ["b"])]),
                ("p", [("b", ["c"])])])
    # the clone carries the original's attributes (html5lib clones do)
    second_b = got.element_children()[1].element_children()[0]
    assert second_b.get("property") == "x"
    # an explicit end tag CANCELS a pending reconstruction: after
    # </div> closes over <b>, </b> removes it from the active list,
    # so "y" is not bold
    got = parse_html("<section><div><b>x</div></b>y</section>")
    assert _shape(got) == (
        "section", [("div", [("b", ["x"])]), "y"])
    # ... and with no following content, no clone materializes
    got = parse_html("<section><div><b>x</div></section>")
    assert _shape(got) == ("section", [("div", [("b", ["x"])])])


def test_parent_end_tag_reopens_formatting_child():
    # </div> implicitly closes <b>; b re-opens for the trailing text
    got = parse_html("<section><div><b>x</div>y</section>")
    assert _shape(got) == (
        "section", [("div", [("b", ["x"])]), ("b", ["y"])])


def test_furthest_block_residual_warns_never_loses_text():
    """A formatting END tag crossing an open non-formatting element is
    the spec's furthest-block dance — the one shape this parser closes
    conservatively, with a diagnostic, never silently."""
    diags: list = []
    got = parse_html("<b>one<p>two</b>three", diagnostics=diags)
    assert got.text_content() == "onetwothree"
    assert any(c == "html-misnested-formatting" for _s, c, _m in diags)
    sev, code, msg = next(d for d in diags
                          if d[1] == "html-misnested-formatting")
    assert sev == "warning" and "furthest-block" in msg


def test_wellformed_input_emits_no_diagnostics():
    diags: list = []
    parse_html('<div vocab="http://s.io/" typeof="T">'
               "<span property=\"name\">x</span></div>",
               diagnostics=diags)
    assert diags == []


# --------------------------------------------------------------------- #
# fixups feed extraction: ancestor chain changes are what RDFa sees
# --------------------------------------------------------------------- #

def test_fostered_rdfa_context_does_not_inherit_table_subject():
    """The RDFa consequence of foster parenting: a property inside the
    fostered div must resolve against the div's REAL (post-fixup)
    ancestors — body, not the table's about."""
    from pyrdfa3_spark.operators.rdfa_engine import Host, RDFaProcessor

    html = ('<body about="http://ex.org/page">'
            '<table about="http://ex.org/table">'
            '<div property="http://ex.org/p">val</div>'
            "<tr><td>x</td></tr></table></body>")
    proc = RDFaProcessor(base="http://ex.org/", host=Host.HTML5,
                         rdfa_version="1.1")
    triples = proc.process(parse_html(html))
    subs = {s for s, p, _o in triples if p == "http://ex.org/p"}
    # fostered OUT of the table: subject is the body's about
    assert subs == {"http://ex.org/page"}


def test_noahs_ark_caps_reformatting_depth():
    """A page of repeated unclosed formatting must parse — the spec's
    Noah's Ark clause (max 3 identical active-formatting entries)
    bounds the clone re-nesting; without it the depth guard would
    reject the document that html5lib handles."""
    got = parse_html("<div>" + "<p><b>x" * 200 + "</div>")
    assert got.text_content() == "x" * 200
    # every paragraph still renders its text inside a <b> clone ...
    ps = got.element_children()
    assert len(ps) == 200 and all(p.tag == "p" for p in ps)
    # ... and the nesting inside any one p stays spec-bounded
    def depth(n):
        ks = n.element_children()
        return 1 + max((depth(k) for k in ks), default=0)
    assert max(depth(p) for p in ps) <= 5


def test_deep_nesting_still_guarded():
    from pyrdfa3_spark.sources.dom import DocumentTooDeep

    with pytest.raises(DocumentTooDeep):
        parse_html("<div>" * 500)
