from __future__ import annotations

from anofox_forecast_spark.webtext.html_extract import _extract_one, extract_html


PAGE = (
    "<html><head><title>My  Page</title><style>p{color:red}</style></head>"
    "<body><h1>Header</h1><p>Hello &amp; welcome to <a href='/x'>our site</a>.</p>"
    "<script>var x = 1;</script><div>Second   block<br>line two</div></body></html>"
)


def test_extract_one_drops_boilerplate_and_decodes_entities():
    title, text, n_links = _extract_one(PAGE)
    assert title == "My Page"
    assert text == "Header\nHello & welcome to our site.\nSecond block\nline two"
    assert n_links == 1
    assert "var x" not in text and "color:red" not in text


def test_extract_one_tolerates_malformed_and_empty():
    assert _extract_one("<p>unclosed <b>bold")[1] == "unclosed bold"
    assert _extract_one("")[1] == ""
    assert _extract_one("plain, no tags")[1] == "plain, no tags"


def test_extract_html_dataframe(spark):
    df = spark.createDataFrame(
        [(1, PAGE), (2, "<p>a</p><p>b</p>"), (3, None)], ["doc_id", "html"]
    )
    out = {r["id"]: r for r in extract_html(df, "doc_id", "html").collect()}
    assert out[1]["title"] == "My Page" and out[1]["n_links"] == 1
    assert out[2]["text"] == "a\nb" and out[2]["n_chars"] == 3
    assert out[3]["text"] == "" and out[3]["n_links"] == 0


def test_extract_html_binary_payload(spark):
    df = spark.createDataFrame(
        [(1, PAGE.encode("utf-8"))], ["doc_id", "html"]
    )
    out = extract_html(df, "doc_id", "html").collect()[0]
    assert out["title"] == "My Page"


def test_extract_html_plan_single_arrow_eval(spark):
    df = spark.createDataFrame([(1, "<p>x</p>")], ["doc_id", "html"])
    plan = (
        extract_html(df, "doc_id", "html")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1
