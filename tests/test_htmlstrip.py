"""HTMLStripCharFilter transcriptions (charfilter/HTMLStripCharFilterTest
.java) against the regex re-derivation in analysis/htmlstrip.py."""

from __future__ import annotations

from lucene_solr_intervals_spark.analysis.htmlstrip import strip_html
from lucene_solr_intervals_spark.analysis.tokenizer import (
    ANALYZERS,
    register_html_strip_analyzer,
)


def test_reference_gold():  # HTMLStripCharFilterTest.test():56
    html = (
        '<div class="foo">this is some text</div> here is a '
        '<a href="#bar">link</a> and another '
        '<a href="http://lucene.apache.org/">link</a>. '
        "This is an entity: &amp; plus a &lt;.  Here is an &. "
        "<!-- is a comment -->"
    )
    gold = (
        "\nthis is some text\n here is a link and "
        "another link. "
        "This is an entity: & plus a <.  Here is an &. "
    )
    assert strip_html(html) == gold


def test_entities():  # testEntities / testGamma:98-112
    assert strip_html("&#946;") == "β"  # beta, numeric
    assert strip_html("&gamma;") == "γ"
    assert strip_html("&nbsp;&amp;&copy;&quot;") == " &©\""


def test_script_and_style_vanish():  # testScriptQuotes/testStyle:430-457
    assert strip_html('a <script type="x">var q = "<br>";</script> b') == "a  b"
    assert (
        strip_html("a <style>body { color: red; } /* > */</style> b") == "a  b"
    )


def test_comments_and_ssi():  # testComment/testServerSideIncludes
    assert strip_html('x <!--#include virtual="f.html" --> y') == "x  y"
    assert strip_html("x <!-- multi\nline\ncomment --> y") == "x  y"


def test_block_vs_inline():
    assert strip_html("<p>one</p><b>two</b>") == "\none\ntwo"
    assert strip_html("line<br>break") == "line\nbreak"


def test_plain_text_passthrough():
    assert strip_html("no markup at all") == "no markup at all"
    assert strip_html("") == ""
    assert strip_html("5 < 6 & 7 > 4") == "5 < 6 & 7 > 4"


def test_registered_chain():
    if "html_code" not in ANALYZERS:
        register_html_strip_analyzer("html_code", base="code")
    terms, positions, doclen = ANALYZERS["html_code"](
        "<div>vector <b>merge</b></div><script>drop();</script> &amp; scan"
    )
    assert terms == ["vector", "merge", "amp", "scan"] or terms == [
        "vector", "merge", "scan",
    ]
    # the decoded '&' is not a token char for the code analyzer
    assert "drop" not in terms and "script" not in terms


def test_registered_chain_exact():
    if "html_code" not in ANALYZERS:
        register_html_strip_analyzer("html_code", base="code")
    terms, positions, doclen = ANALYZERS["html_code"](
        "<div>vector <b>merge</b></div> &amp; scan"
    )
    assert terms == ["vector", "merge", "scan"]
    assert positions == [0, 1, 2]
    assert doclen == 3


def test_unterminated_script_stripped():
    """Review r5b: truncated pages ending mid-script must not leak JS."""
    assert strip_html("intro <script>var a=1; track(user)") == "intro "
    assert strip_html("x <style>body{color:red}") == "x "
    # a closed block followed by an open one
    assert strip_html("a <script>ok</script> b <script>tail") == "a  b "
