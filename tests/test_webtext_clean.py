from __future__ import annotations

import pytest

from anofox_forecast_spark.webtext.clean import (
    c4_page_filters,
    canonicalize_urls,
    normalize_text,
)


def _rows(df, key="id"):
    return {r["id"]: r.asDict() for r in df.collect()}


# ---------------------------------------------------------------- C4 filters


def test_c4_line_rules(spark):
    docs = spark.createDataFrame(
        [
            # 3 good lines -> page kept
            (1, "This is a perfectly fine sentence.\n"
                "Another good line with enough words!\n"
                "And a third one that also terminates?"),
            # line lacks terminal punctuation -> dropped
            (2, "no terminal punctuation here at all\n"
                "But this good line survives the cut."),
            # too few words even though punctuated
            (3, "Too short."),
            # javascript line dropped regardless of punctuation
            (4, "Please enable JavaScript to view this page.\n"
                "A normal sentence with plenty of words here.\n"
                "Second normal sentence with plenty of words.\n"
                "Third normal sentence with plenty of words too."),
        ],
        ["doc_id", "text"],
    )
    out = _rows(c4_page_filters(docs, "doc_id", "text"))
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 3
    assert out[1]["keep_page"] is True
    assert out[2]["n_kept"] == 1
    assert out[3]["n_kept"] == 0 and out[3]["clean_text"] == ""
    # doc 4: javascript line dropped, 3 good ones kept -> page survives
    assert out[4]["n_kept"] == 3 and out[4]["keep_page"] is True
    assert "JavaScript" not in out[4]["clean_text"]


def test_c4_page_rules(spark):
    docs = spark.createDataFrame(
        [
            (1, "A good sentence that is long enough.\n"
                "Second good sentence that is long enough.\n"
                "Third good sentence that is long enough."),
            # only two sentences -> dropped (min_sentences=3)
            (2, "A good sentence that is long enough.\n"
                "Second good sentence that is long enough."),
            # brace -> dropped even with enough sentences
            (3, "A good sentence that is long enough.\n"
                "Second good sentence that is long enough.\n"
                "Third good { sentence } that is long enough."),
            # lorem ipsum -> dropped
            (4, "Lorem Ipsum dolor sit amet consectetur adipiscing.\n"
                "Second good sentence that is long enough.\n"
                "Third good sentence that is long enough."),
        ],
        ["doc_id", "text"],
    )
    out = _rows(c4_page_filters(docs, "doc_id", "text"))
    assert out[1]["keep_page"] is True
    assert out[2]["keep_page"] is False and out[2]["n_sentences"] == 2
    assert out[3]["keep_page"] is False and out[3]["has_brace"] is True
    assert out[4]["keep_page"] is False and out[4]["has_lorem"] is True


def test_c4_banned_words_page_rule(spark):
    docs = spark.createDataFrame(
        [
            (1, "First good sentence that is long enough.\n"
                "Second good sentence that is long enough.\n"
                "Third good sentence that is long enough."),
            # banned word (case-insensitive, token match) -> dropped
            (2, "First good sentence mentioning BadWord here today.\n"
                "Second good sentence that is long enough.\n"
                "Third good sentence that is long enough."),
            # substring inside a longer token is NOT a word hit
            (3, "First sentence mentioning badwordish things here today.\n"
                "Second good sentence that is long enough.\n"
                "Third good sentence that is long enough."),
        ],
        ["doc_id", "text"],
    )
    out = _rows(c4_page_filters(docs, "doc_id", "text",
                                banned_words=["badword"]))
    assert out[1]["has_banned"] is False and out[1]["keep_page"] is True
    assert out[2]["has_banned"] is True and out[2]["keep_page"] is False
    assert out[3]["has_banned"] is False and out[3]["keep_page"] is True
    # disabled rule keeps a stable schema
    off = _rows(c4_page_filters(docs, "doc_id", "text"))
    assert off[2]["has_banned"] is False and off[2]["keep_page"] is True


def test_c4_sentence_count_counts_terminators_in_kept_text(spark):
    docs = spark.createDataFrame(
        [(1, "One. Two. Three. All inside a single kept line.")],
        ["doc_id", "text"],
    )
    out = _rows(c4_page_filters(docs, "doc_id", "text"))
    assert out[1]["n_sentences"] == 4 and out[1]["keep_page"] is True


def test_c4_shuffle_free_plan(spark):
    docs = spark.createDataFrame([(1, "x.")], ["doc_id", "text"])
    plan = c4_page_filters(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


# ------------------------------------------------------------- normalize_text


def test_normalize_nfc_combining_sequence(spark):
    # 'e' + U+0301 combining acute -> precomposed U+00E9 under NFC
    raw = "caf" + "e\u0301"
    docs = spark.createDataFrame([(1, raw)], ["doc_id", "text"])
    out = _rows(normalize_text(docs, "doc_id", "text"))
    assert out[1]["text_norm"] == "caf\u00e9"
    assert out[1]["changed"] is True
    assert out[1]["n_chars_raw"] == 5 and out[1]["n_chars_norm"] == 4


def test_normalize_nfkc_compatibility(spark):
    # NFKC folds the ligature and fullwidth digits; NFC keeps them
    raw = "\ufb01le \uff11\uff12"
    docs = spark.createDataFrame([(1, raw)], ["doc_id", "text"])
    nfc = _rows(normalize_text(docs, "doc_id", "text", form="NFC"))
    nfkc = _rows(normalize_text(docs, "doc_id", "text", form="NFKC"))
    assert nfc[1]["text_norm"] == raw
    assert nfkc[1]["text_norm"] == "file 12"


def test_normalize_controls_and_whitespace(spark):
    docs = spark.createDataFrame(
        [(1, "  a\x00b\x07c   d\t\te\n f  ")], ["doc_id", "text"]
    )
    out = _rows(normalize_text(docs, "doc_id", "text"))
    assert out[1]["text_norm"] == "abc d e f"
    docs2 = spark.createDataFrame([(1, "a\x00b  c")], ["doc_id", "text"])
    out2 = _rows(normalize_text(docs2, "doc_id", "text", collapse_whitespace=False))
    assert out2[1]["text_norm"] == "ab  c"


def test_normalize_rejects_unknown_form(spark):
    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        normalize_text(docs, "doc_id", "text", form="NFX")


def test_normalize_single_python_eval_node(spark):
    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    plan = normalize_text(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    # text_norm feeds three output columns; the UDF must still evaluate once
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan


# ---------------------------------------------------------- canonicalize_urls


def test_url_canonicalize_full(spark):
    docs = spark.createDataFrame(
        [
            (1, "HTTPS://WWW.Example.COM:443/a//b/?utm_source=x&b=2&a=1#frag"),
            (2, "http://example.com:80"),
            (3, "http://example.com:8080/path/"),
            (4, "https://sub.example.com/x?fbclid=abc&gclid=1"),
            (5, "https://example.com/?ref=rss&keep=1&utm_medium=mail"),
        ],
        ["doc_id", "url"],
    )
    out = _rows(canonicalize_urls(docs, "doc_id", "url"))
    assert out[1]["url_canon"] == "https://example.com/a/b?a=1&b=2"
    assert out[1]["n_params_dropped"] == 1
    assert out[2]["url_canon"] == "http://example.com/"
    # non-default port is preserved; trailing slash stripped
    assert out[3]["url_canon"] == "http://example.com:8080/path"
    assert out[4]["url_canon"] == "https://sub.example.com/x"
    assert out[4]["n_params_dropped"] == 2
    assert out[5]["url_canon"] == "https://example.com/?keep=1"
    assert out[5]["n_params_dropped"] == 2


def test_url_canonicalize_keep_www(spark):
    docs = spark.createDataFrame([(1, "https://www.example.com/a")], ["doc_id", "url"])
    out = _rows(canonicalize_urls(docs, "doc_id", "url", strip_www=False))
    assert out[1]["host"] == "www.example.com"


def test_url_canonicalize_idempotent(spark):
    urls = [
        (1, "HTTPS://WWW.Example.COM:443/a//b/?utm_source=x&b=2&a=1#frag"),
        (2, "http://example.com:80"),
        (3, "https://example.com/x?z=9&a=0&utm_x=1"),
    ]
    docs = spark.createDataFrame(urls, ["doc_id", "url"])
    once = canonicalize_urls(docs, "doc_id", "url")
    again = canonicalize_urls(once.select("id", "url_canon"), "id", "url_canon")
    a = {r["id"]: r["url_canon"] for r in once.collect()}
    b = {r["id"]: r["url_canon"] for r in again.collect()}
    assert a == b


def test_url_canonicalize_shuffle_free_plan(spark):
    docs = spark.createDataFrame([(1, "https://e.com/")], ["doc_id", "url"])
    plan = canonicalize_urls(docs, "doc_id", "url")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_url_filter_rules(spark):
    from anofox_forecast_spark.webtext.clean import url_filter

    docs = spark.createDataFrame(
        [
            (1, "https://good.example/page"),
            (2, "https://Spam.example:8080/page"),        # exact host (case/port)
            (3, "https://cdn.spam.example/page"),         # subdomain of blocked
            (4, "https://notspam.example/page"),          # prefix, NOT a subdomain
            (5, "https://good.example/img.JPG"),          # blocked extension
            (6, "https://good.example/casino/page"),      # badword in url
            (7, "https://good.example/jpg"),              # 'jpg' not an extension
        ],
        ["doc_id", "url"],
    )
    out = {r["id"]: r for r in url_filter(
        docs, "doc_id", "url",
        blocked_hosts=["spam.example"], url_badwords=["casino"],
    ).collect()}
    assert out[1]["keep"] is True
    assert out[2]["host_blocked"] is True and out[2]["host"] == "spam.example"
    assert out[3]["host_blocked"] is True
    assert out[4]["host_blocked"] is False and out[4]["keep"] is True
    assert out[5]["ext_blocked"] is True and out[5]["keep"] is False
    assert out[6]["badword_hit"] is True and out[6]["keep"] is False
    assert out[7]["ext_blocked"] is False and out[7]["keep"] is True


def test_url_filter_shuffle_free(spark):
    from anofox_forecast_spark.webtext.clean import url_filter

    docs = spark.createDataFrame([(1, "https://a.b/c")], ["doc_id", "url"])
    plan = url_filter(docs, "doc_id", "url")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
