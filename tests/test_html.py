"""HTML main-content extraction (operators/html.py) — planted
boilerplate must drop, prose must survive char-for-char (VERDICT
r11 #2's pytest leg; cross-engine parity is the driver's
html_extracted_text_check)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stripe_data_pipeline_spark.operators.html import extract_main_text


def _extract_one(spark, html: str) -> dict:
    df = spark.createDataFrame([(1, html)], "id long, html string")
    return extract_main_text(df, "html").collect()[0].asDict()


def test_planted_boilerplate_dropped_prose_kept(spark):
    r = _extract_one(
        spark,
        '<html><head><title>T</title>'
        "<style>p { color: red }</style>"
        "<script>var hidden = 'never show'; if (1 < 2) {}</script>"
        "</head><body><!-- secret comment -->"
        '<div class="nav"><a href="/">Home</a> <a href="/a">About</a></div>'
        "<p>Real prose paragraph that should clearly survive.</p>"
        '<p>Prose with an inline <a href="/r">anchor text</a> kept.</p>'
        '<footer><a href="/p">Privacy</a> | <a href="/t">Terms</a></footer>'
        "</body></html>",
    )
    blocks = r["main_text"].split("\n")
    assert blocks == [
        "T",
        "Real prose paragraph that should clearly survive.",
        "Prose with an inline anchor text kept.",
    ]
    # nav and footer counted, then dropped by link density
    assert (r["n_blocks"], r["n_blocks_kept"]) == (5, 3)
    for leaked in ("never show", "color: red", "secret comment",
                   "Home", "Privacy"):
        assert leaked not in r["main_text"]


def test_entities_unescaped_after_tag_strip(spark):
    r = _extract_one(
        spark,
        "<p>Fish &amp; chips cost &lt; 5&nbsp;pounds &#39;cheap&#39; "
        "&quot;deal&quot;; literal &amp;lt; stays escaped</p>",
    )
    assert r["main_text"] == (
        "Fish & chips cost < 5 pounds 'cheap' \"deal\"; "
        "literal &lt; stays escaped"
    )


def test_link_density_threshold_is_integer_exact(spark):
    # exactly-at-threshold block is KEPT (<=), just-over is dropped:
    # txt "aaaa bbbb x" (11 chars) with anchor "aaaa" -> nolink
    # "bbbb x" (6) -> link 5/11 = 4545bp > 4000 -> dropped
    over = _extract_one(
        spark, '<p><a href="/">aaaa</a> bbbb x</p><p>keep me here</p>'
    )
    assert over["main_text"] == "keep me here"
    # anchor 4 of 14 chars = 2857bp <= 4000 -> kept whole
    under = _extract_one(
        spark, '<p><a href="/">aaaa</a> bbbbbbbb x</p>'
    )
    assert under["main_text"] == "aaaa bbbbbbbb x"


def test_whitespace_collapse_and_empty_blocks(spark):
    r = _extract_one(
        spark,
        "<div>   </div><p>spaced    out\t\ttext</p><br><div></div>",
    )
    assert r["main_text"] == "spaced out text"
    assert r["n_blocks"] == 1  # blank blocks never counted
