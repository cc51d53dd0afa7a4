"""HTMLStripCharFilter analog: strip markup ahead of the tokenizer.

Reference: /root/reference/lucene/analysis/common/src/java/org/apache/
lucene/analysis/charfilter/HTMLStripCharFilter.java (a 31k-line JFlex
scanner).  This is the pragmatic regex re-derivation of its observable
behavior (HTMLStripCharFilterTest.test):

* <script>/<style> blocks vanish INCLUDING their content;
* comments (incl. server-side includes) vanish;
* block-level tags become "\\n" (the test's gold strings show <div> ->
  newline), inline tags (<a>, <b>, ...) are removed outright;
* character entities decode (&amp; -> &, &lt; -> <, numeric forms) via
  the full HTML5 table (html.unescape — a superset of the reference's
  entity list); a bare '&' survives.

The web-corpus entry point: strip boilerplate markup BEFORE tokenize in
an LLM-pretraining pipeline.  One C-level regex pass per document, same
char-filter placement as ASCII folding; offsets refer to the STRIPPED
text.
"""

from __future__ import annotations

import html
import re

_SCRIPT_STYLE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
# truncated web pages routinely end mid-script: an UNTERMINATED
# script/style block is stripped to end-of-text (run after the closed-pair
# pass, so only a genuinely unclosed block matches)
_SCRIPT_STYLE_OPEN = re.compile(
    r"<(script|style)\b[^>]*>.*\Z", re.IGNORECASE | re.DOTALL
)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
# block-level elements whose boundaries become newlines
_BLOCK = (
    "address|article|aside|blockquote|br|caption|center|dd|dir|div|dl|dt|"
    "fieldset|figure|footer|form|frame|h1|h2|h3|h4|h5|h6|header|hr|li|"
    "listing|main|menu|nav|noscript|ol|p|pre|section|table|tbody|td|tfoot|"
    "th|thead|title|tr|ul"
)
_BLOCK_TAG = re.compile(rf"</?(?:{_BLOCK})\b[^>]*/?>", re.IGNORECASE)
_ANY_TAG = re.compile(r"</?[A-Za-z!][^>]*>")


def strip_html(text: str) -> str:
    """Strip one document's markup (C-level regex passes, no per-char
    Python)."""
    if not text or "<" not in text and "&" not in text:
        return text
    t = _SCRIPT_STYLE.sub("", text)
    t = _SCRIPT_STYLE_OPEN.sub("", t)
    t = _COMMENT.sub("", t)
    t = _BLOCK_TAG.sub("\n", t)
    t = _ANY_TAG.sub("", t)
    return html.unescape(t)
