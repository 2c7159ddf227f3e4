"""HTML extraction: block removal, entity order, idempotence, audit."""

import pytest
from pyspark.sql import functions as F

from featuregenerator_spark.operators.html_extract import with_html_extract


def _run(spark, html):
    df = spark.createDataFrame([(0, html)], "doc_id long, html string")
    return with_html_extract(df).first()


def test_script_style_comment_removed_wholesale(spark):
    r = _run(
        spark,
        "<p>keep.</p><script>\nvar a = 1 < 2;\nalert('x');\n</script>"
        "<STYLE>p { color: red }</STYLE><!-- secret\nnote -->",
    )
    assert r["extracted"] == "keep."
    # multiline contents (dotall) and uppercase tags both removed


def test_block_closers_become_lines(spark):
    r = _run(spark, "<div>a.</div><p>b.</p><li>c.</li>line<br>d")
    assert r["extracted"].split("\n") == ["a.", "b.", "c.", "line", "d"]


def test_entity_decode_amp_last(spark):
    r = _run(spark, "<p>x &amp;lt; y &quot;q&quot; a &nbsp; b &#39;s</p>")
    # &amp;lt; decodes to the LITERAL '&lt;' (amp last), never to '<';
    # '&nbsp;' between spaces yields 3 interior spaces (only line ENDS
    # are trimmed)
    assert r["extracted"] == "x &lt; y \"q\" a   b 's"
    assert "<" not in r["extracted"].replace("&lt;", "")


def test_encoded_angle_brackets_not_stripped(spark):
    r = _run(spark, "<p>&lt;verbatim&gt;</p>")
    assert r["extracted"] == "<verbatim>"


def test_plain_text_passthrough(spark):
    r = _run(spark, "no markup here just words")
    assert r["extracted"] == "no markup here just words"
    assert r["n_tags"] == 0 and r["n_lines"] == 1


def test_tag_audit_counts(spark):
    r = _run(spark, "<html><body><p>x</p><script>s</script></body></html>")
    # tags: html body p /p /body /html (6) + script block (1)
    assert r["n_tags"] == 7


def test_lines_trimmed_and_empties_dropped(spark):
    r = _run(spark, "<p>  a  </p><p>   </p><p>b</p>")
    assert r["extracted"].split("\n") == ["a", "b"]
    assert r["n_lines"] == 2
