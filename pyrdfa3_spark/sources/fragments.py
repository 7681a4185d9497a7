"""Deterministic RDFa fragment corpus (FIXTURES.md §2).

Every template exercises a feature row of the SURVEY.md §2 inventory and
is parameterized by the placeholder ``{K}`` (a non-negative integer),
substituted columnar-side with ``regexp_replace`` — no per-row Python in
the generator.  ~80%% of fragments use the ``schema:`` prefix, creating
the hot-prefix skew fixture the salted broadcast join is tested against.
"""

from __future__ import annotations

# doc_kind per template: html5 | svg
FRAGMENT_TEMPLATES: list[tuple[str, str]] = [
    # 1. plain literals + language inheritance
    ("html5",
     '<div lang="en" about="#item{K}" vocab="http://schema.org/">'
     '<span property="name">Item {K}</span>'
     '<span property="alternateName" lang="fr">Objet {K}</span></div>'),
    # 2. @content + @datatype
    ("html5",
     '<div about="#m{K}" prefix="xsd: http://www.w3.org/2001/XMLSchema#">'
     '<span property="http://schema.org/position" datatype="xsd:integer" '
     'content="{K}">pos</span></div>'),
    # 3. bogus datatype value (diagnostics fixture)
    ("html5",
     '<div about="#bad{K}"><span property="http://schema.org/ratingValue" '
     'datatype="xsd:integer" content="notanint{K}">x</span></div>'),
    # 4. XML literal
    ("html5",
     '<div about="#x{K}"><span property="http://schema.org/description" '
     'datatype="rdf:XMLLiteral">part <b>{K}</b> of it</span></div>'),
    # 5. @prefix + safe CURIE + named bnode
    ("html5",
     '<div prefix="ex: http://example.org/ns{K}#">'
     '<div about="[ex:thing]" rel="ex:link" resource="_:n{K}"></div>'
     '<div about="_:n{K}" property="ex:label" content="joe{K}"></div></div>'),
    # 6. xmlns: declaration (deprecated-in-1.1 path)
    ("html5",
     '<div xmlns:dcx="http://purl.org/dc/terms/" about="#d{K}" '
     'property="dcx:title" content="t{K}"></div>'),
    # 7. @vocab + terms + typeof
    ("html5",
     '<div vocab="http://schema.org/" about="#p{K}" typeof="Person">'
     '<span property="name">P{K}</span></div>'),
    # 8. @vocab reset + initial-context term fallback
    ("html5",
     '<div vocab="http://schema.org/"><div vocab="">'
     '<a about="#w{K}" rel="license" href="http://lic.example/{K}">l</a>'
     '</div></div>'),
    # 9. bare @property + @typeof chaining (bnode minting)
    ("html5",
     '<div vocab="http://schema.org/" about="#e{K}">'
     '<div property="address" typeof="PostalAddress">'
     '<span property="postalCode">9{K}</span></div></div>'),
    # 10. @rel incomplete triples completed by two children
    ("html5",
     '<div about="#s{K}" rel="http://schema.org/knows">'
     '<div about="#f{K}a"><span property="http://schema.org/name">A{K}'
     '</span></div><div about="#f{K}b"></div></div>'),
    # 11. @rev
    ("html5",
     '<div about="#r{K}" rev="http://schema.org/author" '
     'resource="#doc{K}"></div>'),
    # 12. @inlist property list (ordered)
    ("html5",
     '<div about="#l{K}">'
     '<span property="http://schema.org/keywords" inlist="">k{K}a</span>'
     '<span property="http://schema.org/keywords" inlist="">k{K}b</span>'
     '</div>'),
    # 13. empty @inlist rel -> rdf:nil
    ("html5",
     '<div about="#n{K}" rel="http://schema.org/itemListElement" '
     'inlist=""></div>'),
    # 14. relative IRIs + '#'/'?' tails against the per-turn base
    ("html5",
     '<div about="sub/page{K}" rel="http://schema.org/url" '
     'href="item{K}?"></div>'),
    # 15. HTML5 <time> datatype sniffing
    ("html5",
     '<div about="#t{K}"><time property="http://schema.org/startDate" '
     'datetime="2026-03-01T10:0{X}">soon</time></div>'),
    # 16. @role with @id
    ("html5",
     '<div id="nav{K}" role="navigation" about="#z{K}" '
     'property="http://schema.org/name" content="nav{K}"></div>'),
    # 17. SVG host: xml:base + xml:lang (XML parse path)
    ("svg",
     '<svg xmlns="http://www.w3.org/2000/svg" '
     'xml:base="http://svg.example/{K}/" xml:lang="de">'
     '<g about="shape{K}" property="http://purl.org/dc/terms/title">'
     'Form {K}</g></svg>'),
    # 18. case-insensitive term + unknown-prefix absolute-IRI fallback
    ("html5",
     '<div about="#c{K}" rel="LICENSE" resource="#lic{K}"></div>'),
    # 19. rdfa:copy / rdfa:Pattern prototype (graph post-op G1 fixture)
    ("html5",
     '<div><div about="#proto{K}" typeof="rdfa:Pattern">'
     '<span property="http://schema.org/name">proto{K}</span></div>'
     '<div about="#inst{K}" property="rdfa:copy" resource="#proto{K}">'
     '</div></div>'),
    # 20. nested @about re-anchoring + typeof on object with rel
    ("html5",
     '<div about="#o{K}" rel="http://schema.org/member" '
     'typeof="http://schema.org/Organization" resource="#org{K}"></div>'),
    # 21. embedded turtle script merged with surrounding RDFa (E14)
    ("html5",
     '<div><div about="#h{K}" property="http://schema.org/name">H{K}</div>'
     '<script type="text/turtle">@prefix s: <http://schema.org/> . '
     '<#t{K}> s:follows <#h{K}> ; s:score 4{X} .</script></div>'),
    # 22. @property + @rel + @content on one element (rel CURIE survives
    # remove_rel; property takes the literal branch)
    ("html5",
     '<div about="#m{K}" property="http://schema.org/p1" '
     'rel="http://schema.org/r1" resource="#o{K}" content="cv{K}"></div>'),
    # 23. hanging @rel+@inlist completed by children (list of subjects)
    ("html5",
     '<div about="#lp{K}" rel="http://schema.org/itemList" inlist="">'
     '<span about="#e{K}a">1</span><span about="#e{K}b">2</span></div>'),
    # 24. deep language inheritance + reset
    ("html5",
     '<div lang="de" about="#lg{K}"><span><b '
     'property="http://schema.org/name">Wert {K}</b></span>'
     '<span lang="" property="http://schema.org/alt">plain {K}</span></div>'),
    # 25. safe CURIEs with bound prefixes on both subject and object
    ("html5",
     '<div prefix="px: http://px.example/{K}#">'
     '<div about="[px:s]" rel="px:r" resource="[px:o]"></div></div>'),
    # 26. @datatype via local prefix + @content wins over element text
    ("html5",
     '<div prefix="dtx: http://www.w3.org/2001/XMLSchema#" about="#dt{K}">'
     '<span property="http://schema.org/v" datatype="dtx:date" '
     'content="2026-01-0{X}">shown text ignored</span></div>'),
    # 27. nested xml:base overrides in SVG with relative @about
    ("svg",
     '<svg xmlns="http://www.w3.org/2000/svg" '
     'xml:base="http://sbase.example/a/">'
     '<g about="top{K}" property="http://purl.org/dc/terms/title">t{K}</g>'
     '<g xml:base="http://sbase.example/b/"><g about="inner{K}" '
     'property="http://purl.org/dc/terms/title">u{K}</g></g></svg>'),
    # 28. about="" self-reference + multiple @typeof values
    ("html5",
     '<div about="" typeof="http://schema.org/Thing '
     'http://schema.org/CreativeWork">'
     '<span property="http://schema.org/version" content="{K}"></span>'
     '</div>'),
    # 29. @rel and @rev together on one element
    ("html5",
     '<div about="#rr{K}" rel="http://schema.org/knows" '
     'rev="http://schema.org/knownBy" resource="#peer{K}"></div>'),
    # 30. bare @property + @typeof + @resource (typed_resource = resource)
    ("html5",
     '<div about="#pr{K}"><div property="http://schema.org/work" '
     'typeof="http://schema.org/Book" resource="#bk{K}">'
     '<span property="http://schema.org/isbn">97{K}</span></div></div>'),
    # 31. <base href> overrides the per-turn base for all resolution
    ("html5",
     '<div><base href="http://rebased.example/{K}/dir/page"/>'
     '<div about="rel{K}" rel="http://schema.org/url" href="../up{K}">'
     '</div></div>'),
    # 32. XMLLiteral with inherited xmlns decoration (string-exact
    # serialization parity with minidom toxml)
    ("html5",
     '<div xmlns:exl="http://exl.example/{K}#" about="#xl{K}">'
     '<span property="http://schema.org/description" '
     'datatype="rdf:XMLLiteral">pre <exl:tag attr="v{K}">mid</exl:tag> '
     'post {K}</span></div>'),
    # 33. empty safe CURIE '[]' pruned (T2/F3) -> subject falls back to
    # the inherited one instead of a broken reference
    ("html5",
     '<div about="[]" property="http://schema.org/name" '
     'content="kept{K}"></div>'),
    # 34. @datatype="" forces a plain literal (no datatype, lang kept)
    ("html5",
     '<div lang="en" about="#ed{K}"><span '
     'property="http://schema.org/text" datatype="">raw {K}</span></div>'),
    # 35. @property + @href (no rel/content/datatype) -> IRI object
    ("html5",
     '<a about="#ph{K}" property="http://schema.org/url" '
     'href="http://x.example/{K}">x</a>'),
    # 36. @src as the resource source (img)
    ("html5",
     '<div about="#im{K}" rel="http://schema.org/image">'
     '<img src="pic{K}.png"/></div>'),
    # 37. multi-valued @property emits one triple per IRI
    ("html5",
     '<span about="#mv{K}" property="http://schema.org/name '
     'http://schema.org/alternateName">nm{K}</span>'),
    # 38. prefix redefinition in a nested scope (copy-on-write maps)
    ("html5",
     '<div prefix="ex: http://outer.example/{K}#">'
     '<span about="#pa{K}" property="ex:p" content="outer"></span>'
     '<div prefix="ex: http://inner.example/{K}#">'
     '<span about="#pb{K}" property="ex:p" content="inner"></span>'
     '</div></div>'),
    # 39. forbidden '_:' prefix declaration ignored (warning), named
    # bnodes still resolve through the bnode branch
    ("html5",
     '<div prefix="_: http://forbidden.example/ '
     'ok: http://ok.example/{K}#">'
     '<div about="_:fb{K}" property="ok:p" content="v{K}"></div></div>'),
    # 40. <time> gYear + gYearMonth sniffing
    ("html5",
     '<div about="#ty{K}"><time property="http://schema.org/year" '
     'datetime="201{X}">then</time>'
     '<time property="http://schema.org/month" datetime="201{X}-05">'
     'that month</time></div>'),
    # 41. <time> xsd:duration sniffing
    ("html5",
     '<div about="#td{K}"><time property="http://schema.org/dur" '
     'datetime="PT{X}H30M">a while</time></div>'),
    # 42. whitespace-heavy multi-valued @rel (split on any whitespace)
    ("html5",
     '<div about="#ws{K}" rel="  http://a.example/r1 \t '
     'http://a.example/r2  " resource="#tgt{K}"></div>'),
    # 43. empty @resource resolves to the base
    ("html5",
     '<div about="#er{K}" rel="http://schema.org/url" resource="">'
     '</div>'),
    # 44. bare @typeof (no about) mints the subject bnode for children
    ("html5",
     '<div typeof="http://schema.org/Thing">'
     '<span property="http://schema.org/name">b{K}</span></div>'),
    # 45. empty-prefix CURIE ':term' -> default CURIE namespace (XHTML
    # vocab)
    ("html5",
     '<div about="#dc{K}" rel=":next" resource="#n{K}"></div>'),
    # 46. unresolvable bare term with no @vocab -> no triple emitted
    ("html5",
     '<div about="#ut{K}"><span property="notaterm-{K}">dropped</span>'
     '<span property="http://schema.org/ok">kept {K}</span></div>'),
    # 47. @version on the root pins RDFa 1.0 for the whole document
    # (E1 dispatch): 1.0 has no @vocab/@prefix, so only the xmlns:
    # mapping resolves and the literal is a plain one
    ("html5",
     '<div version="XHTML+RDFa 1.0" xmlns:v10="http://v10.example/{K}#" '
     'about="#v{K}" property="v10:name" content="old{K}"></div>'),
    # 48. <time> datetime with numeric timezone offset (html5.py:131-154)
    ("html5",
     '<div about="#tz{K}"><time property="http://schema.org/when" '
     'datetime="2026-03-0{X}T10:30:00+02:00">then</time></div>'),
    # 49. negative duration -P...
    ("html5",
     '<div about="#nd{K}"><time property="http://schema.org/offset" '
     'datetime="-P{X}D">ago</time></div>'),
    # 50. safe CURIE bnode [_:label] as subject and object
    ("html5",
     '<div about="[_:sb{K}]" rel="http://schema.org/rel" '
     'resource="[_:ob{K}]"></div>'),
    # 51. @inlist on an element carrying both @rel and @property
    ("html5",
     '<div about="#rp{K}"><span rel="http://schema.org/r" inlist="" '
     'property="http://schema.org/p" resource="#t{K}">txt{K}</span></div>'),
    # 52. empty @content overrides element text with the empty literal
    ("html5",
     '<div about="#ec{K}" property="http://schema.org/note" content="">'
     'invisible {K}</div>'),
    # 53. @rel+@typeof+@resource: the object (not subject) gets the type
    ("html5",
     '<div about="#to{K}" rel="http://schema.org/made" '
     'typeof="http://schema.org/Product" resource="#prod{K}"></div>'),
    # 54. single-digit <time> components: strptime's lexical space
    # ('2014-5-7', '9:5' ARE valid %Y-%m-%d / %H:%M values) — guards the
    # r2 shape-gate fix; X=0 cases fall through to plain on both engines
    ("html5",
     '<div about="#sd{K}"><time property="http://schema.org/d" '
     'datetime="2014-5-{X}">d</time>'
     '<time property="http://schema.org/t" datetime="9:{X}">t</time>'
     '<time property="http://schema.org/md" datetime="1-{X}">m</time></div>'),
    # 55. @datetime on a NON-time element (html5 extra-attrs applies to
    # any element carrying the attribute, html5.py:157-175)
    ("html5",
     '<div about="#nd{K}"><span property="http://schema.org/published" '
     'datetime="2026-0{X}-15">long ago</span></div>'),
    # 56. @rel whose every token is a term -> removed entirely when
    # @property is present (remove_rel T5 edge: attr dropped, rel branch
    # never taken)
    ("html5",
     '<div about="#rr{K}"><a rel="license next" '
     'property="http://schema.org/url" href="/l{K}">t</a></div>'),
    # 57. @typeof="" (empty) on an element with @about: no type triple,
    # but the typed-resource branch still anchors the subject
    ("html5",
     '<div about="#te{K}" typeof="">'
     '<span property="http://schema.org/name">T{K}</span></div>'),
    # 58. @href-only subject in the no-rel branch (subject from href)
    ("html5",
     '<a href="/doc{K}" property="http://schema.org/name">D{K}</a>'),
    # 59. @inlist with multi-valued @property: both lists get the member
    ("html5",
     '<div about="#ml{K}">'
     '<span property="http://schema.org/a http://schema.org/b" '
     'inlist="">v{K}</span></div>'),
    # 60. nested xml:base re-basing inside SVG (ACCEPT_XML_BASE host)
    ("svg",
     '<svg xmlns="http://www.w3.org/2000/svg" '
     'xml:base="http://base{X}.example/dir/">'
     '<g xml:base="http://inner{X}.example/sub/">'
     '<title property="http://schema.org/name" about="rel{K}">n{K}'
     '</title></g></svg>'),
    # 61. safe CURIE with unknown prefix in @about: skipped entirely
    # (empty-safe-curie prune keeps descendants from hanging)
    ("html5",
     '<div about="[nosuch:x{K}]">'
     '<span property="http://schema.org/name">orphan {K}</span></div>'),
    # 62. unterminated safe CURIE treated as plain (lexical edge)
    ("html5",
     '<div about="[broken{K}" rel="http://schema.org/url" '
     'href="/u{K}"></div>'),
    # 54. unknown datatype IRI: literal kept untouched, no validation
    ("html5",
     '<div about="#ud{K}"><span property="http://schema.org/raw" '
     'datatype="http://types.example/custom{K}" content="c{K}">x</span>'
     '</div>'),
    # 55. deeply nested chain: three levels of bare-property bnode
    # minting (incomplete-triple threading through two hops)
    ("html5",
     '<div vocab="http://schema.org/" about="#d{K}">'
     '<div property="maker" typeof="Organization">'
     '<div property="location" typeof="Place">'
     '<span property="name">HQ {K}</span></div></div></div>'),
    # 56. uppercase prefix declaration (1.1 lowercases on definition)
    # used with lowercase reference
    ("html5",
     '<div prefix="UPC: http://upper.example/{K}#">'
     '<span about="#uc{K}" property="upc:p" content="v{K}"></span></div>'),
    # 57. malformed @prefix (odd token count) ignored with a warning;
    # a later well-formed pair on the same element still binds
    ("html5",
     '<div prefix="broken ok: http://okay.example/{K}#">'
     '<span about="#mp{K}" property="ok:p" content="w{K}"></span></div>'),
    # 58. relative @vocab resolves against the base
    ("html5",
     '<div vocab="ns{K}/" about="#rv{K}">'
     '<span property="term">rel vocab {K}</span></div>'),
    # 59. @lang and @xml:lang conflict on one element: xml:lang wins
    ("html5",
     '<div about="#lc{K}" lang="fr" xml:lang="de" '
     'property="http://schema.org/label">Wert {K}</div>'),
    # 60. empty @property value -> no triple from it
    ("html5",
     '<div about="#ep{K}"><span property="">dropped</span>'
     '<span property="http://schema.org/kept">yes {K}</span></div>'),
    # 61. @about beats @src in first-win resource resolution
    ("html5",
     '<div><img about="#win{K}" src="lose{K}.png" '
     'rel="http://schema.org/img" resource="#target{K}"/></div>'),
    # 62. safe CURIE in @resource with declared prefix, CURIE in @rel
    ("html5",
     '<div prefix="sc: http://safe.example/{K}#" about="#sr{K}" '
     'rel="sc:linksTo" resource="[sc:dest]"></div>'),
    # 63. whitespace-only text content -> empty literal (space_preserve)
    ("html5",
     '<div about="#ws2{K}" property="http://schema.org/blank">  </div>'),
    # 64. rdf:HTML literal: markup subtree serialized as the value
    ("html5",
     '<div about="#hl{K}"><span property="http://schema.org/body" '
     'datatype="rdf:HTML">see <b class="hot">item {K}</b> now</span>'
     '</div>'),
]

N_TEMPLATES = len(FRAGMENT_TEMPLATES)

PROSE_BEFORE = [
    "Sure - here is the snippet you asked about: ",
    "I found this markup on the page: ",
    "The tool returned the following document. ",
    "Quoting the relevant part now, ",
]
PROSE_AFTER = [
    " Hope that helps!",
    " Let me know if you need more detail.",
    " That was everything on the page.",
    " End of extract.",
]


def render_fragment(template_idx: int, k: int) -> tuple[str, str]:
    """Pure-Python rendering (used by tests and the golden oracle)."""
    kind, tpl = FRAGMENT_TEMPLATES[template_idx % N_TEMPLATES]
    return kind, tpl.replace("{K}", str(k)).replace("{X}", str(k % 10))
